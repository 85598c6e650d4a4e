"""Natural training CLI for AudioNet CSI-NE (re-design of reference
natural_train.py): Adam + CE + uniform-noise augmentation, per-epoch
checkpointing, per-epoch validation.  The whole train step is one jitted
function; pass -n_devices > 1 to shard the batch over a device mesh."""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from speakerguard_tpu.cli.common import add_defense_args
from speakerguard_tpu.data.dataset import Spk251_train, Spk251_test
from speakerguard_tpu.models.audionet import (
    init_audionet, parse_label_encoder, AudioNet)
from speakerguard_tpu.models.training import (
    make_natural_train_step, save_checkpoint, load_checkpoint)
from speakerguard_tpu.parallel.mesh import (
    make_mesh, sharded_train_step, shard_batch, replicate)


def parse_args(argv=None):
    import argparse
    parser = argparse.ArgumentParser()
    add_defense_args(parser)
    parser.add_argument("-label_encoder",
                        default="./label-encoder-audionet-Spk251_test.txt")
    parser.add_argument("-aug_eps", type=float, default=0.002)
    parser.add_argument("-root", default="./data")
    parser.add_argument("-num_epoches", type=int, default=30)
    parser.add_argument("-batch_size", type=int, default=128)
    parser.add_argument("-wav_length", type=int, default=80_000)
    parser.add_argument("-model_ckpt", type=str, default=None)
    parser.add_argument("-log", type=str, default=None)
    parser.add_argument("-ori_model_ckpt", type=str, default=None)
    parser.add_argument("-start_epoch", type=int, default=0)
    parser.add_argument("-evaluate_per_epoch", type=int, default=1)
    parser.add_argument("-lr", type=float, default=1e-3)
    parser.add_argument("-n_devices", type=int, default=1)
    parser.add_argument("-seed", type=int, default=0)
    parser.add_argument("-precision", choices=("f32", "bf16"),
                        default="f32",
                        help="bf16 = mixed-precision train step (bf16 network compute, f32 master weights/optimizer/BN stats); f32 matches the torch reference exactly")
    parser.add_argument("-ckpt_backend", choices=("pickle", "orbax"),
                        default="pickle",
                        help="orbax = TPU-native async checkpointing "
                             "(non-blocking saves, multi-host safe)")
    return parser.parse_args(argv)


def validate(params, state, spk_ids, root):
    model = AudioNet(params, state, spk_ids=spk_ids)
    val = Spk251_test(spk_ids, root, return_file_name=True)
    right = 0
    for wavs, labels, _ in val.batches(1):
        d, _ = model.make_decision(jnp.asarray(wavs[:, 0, :]))
        right += int(np.asarray(d)[0] == labels[0])
    return right / len(val)


def main(args):
    rng = np.random.default_rng(args.seed)
    if not os.path.exists(args.label_encoder):
        # build the label encoder from the training-set speaker dirs
        # (the reference ships this file; we synthesize it when absent)
        from speakerguard_tpu.utils.kaldi_io import write_label_encoder
        train_root = os.path.join(args.root, "Spk251_train")
        spk_dirs = sorted(d for d in os.listdir(train_root)
                          if os.path.isdir(os.path.join(train_root, d)))
        write_label_encoder(args.label_encoder, spk_dirs)
        print(f"wrote label encoder for {len(spk_dirs)} speakers to "
              f"{args.label_encoder}")
    spk_ids = parse_label_encoder(args.label_encoder)

    if args.ori_model_ckpt:
        if args.ckpt_backend == "orbax":
            from speakerguard_tpu.models.training import load_checkpoint_orbax
            p0, s0 = init_audionet(rng, num_class=len(spk_ids))
            opt = optax.adam(args.lr)
            params, state, opt_state0, _ = load_checkpoint_orbax(
                args.ori_model_ckpt, p0, s0, opt.init(p0))
        else:
            params, state, opt_state0, _ = load_checkpoint(
                args.ori_model_ckpt)
    else:
        params, state = init_audionet(rng, num_class=len(spk_ids))
        opt_state0 = None
    opt = optax.adam(args.lr)
    opt_state = opt_state0 if opt_state0 is not None else opt.init(params)

    if args.ckpt_backend == "orbax":
        from speakerguard_tpu.models.training import save_checkpoint_orbax \
            as save_checkpoint  # noqa: F811 - backend switch (async saves)
    else:
        from speakerguard_tpu.models.training import save_checkpoint \
            as _sc_pickle

        def save_checkpoint(path, *a, wait=False, **kw):  # noqa: F811
            _sc_pickle(path, *a, **kw)

    step = make_natural_train_step(opt, aug_eps=args.aug_eps,
                                   compute_dtype=args.precision)
    mesh = None
    if args.n_devices > 1:
        mesh = make_mesh(args.n_devices, axes=("data",))
        step = sharded_train_step(step, mesh)
        params = replicate(params, mesh)
        state = replicate(state, mesh)
        opt_state = replicate(opt_state, mesh)

    train = Spk251_train(spk_ids, args.root, wav_length=args.wav_length,
                         seed=args.seed)
    print("load train data done", len(train))

    ckpt_base = args.model_ckpt or "./model_file/audionet-natural"
    # file logger (reference natural_train.py:116-118,172,192)
    import logging
    log_path = args.log or f"{ckpt_base}.log"
    os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
    logger = logging.getLogger("speakerguard.natural_train")
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    for h in list(logger.handlers):  # re-invocation must not duplicate lines
        logger.removeHandler(h)
        h.close()
    logger.addHandler(logging.FileHandler(log_path))
    key = jax.random.PRNGKey(args.seed)
    for i_epoch in range(args.num_epoches):
        accs = []
        from speakerguard_tpu.parallel.input import prefetch
        for batch_id, (wavs, labels) in enumerate(prefetch(
                train.batches(args.batch_size, shuffle=True,
                              drop_last=args.n_devices > 1))):
            t0 = time.time()
            wavs = jnp.asarray(wavs[:, 0, :]) / (2.0 ** 15) \
                if np.abs(wavs).max() > 2 else jnp.asarray(wavs[:, 0, :])
            labels = jnp.asarray(labels)
            if mesh is not None:
                wavs = shard_batch(wavs, mesh)
                labels = shard_batch(labels, mesh)
            key, sub = jax.random.split(key)
            params, state, opt_state, loss, acc = step(
                params, state, opt_state, wavs, labels, sub)
            accs.append(float(acc))
            print(f"Batch {batch_id}: loss={float(loss):.4f} "
                  f"acc={float(acc):.4f} time={time.time() - t0:.3f}s",
                  end="\r")
        epoch = i_epoch + args.start_epoch
        print(f"\nEPOCH {epoch}: Acc = {np.mean(accs):.4f}")
        logger.info("EPOCH %d/%d: Acc = %.6f", epoch,
                    args.num_epoches + args.start_epoch, np.mean(accs))
        save_checkpoint(f"{ckpt_base}_{epoch}", params, state, opt_state,
                        epoch)
        if args.evaluate_per_epoch > 0 and \
                i_epoch % args.evaluate_per_epoch == 0:
            val_acc = validate(params, state, spk_ids, args.root)
            print("Val Acc: %f" % val_acc)
            logger.info("Val Acc: %.6f", val_acc)
    save_checkpoint(ckpt_base, params, state, opt_state,
                    args.num_epoches + args.start_epoch, wait=True)


if __name__ == "__main__":
    main(parse_args())
