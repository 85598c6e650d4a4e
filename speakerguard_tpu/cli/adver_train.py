"""Adversarial training CLI (re-design of reference adver_train.py):
FGSM/PGD generation nested INSIDE the jitted train step against the live
parameters, `ratio` of each minibatch replaced with adversarial examples."""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from speakerguard_tpu.cli.common import add_defense_args
from speakerguard_tpu.data.dataset import Spk251_train
from speakerguard_tpu.models.audionet import init_audionet, \
    parse_label_encoder
from speakerguard_tpu.models.training import (
    make_adver_train_step, make_pgd_for_training, save_checkpoint,
    load_checkpoint)
from speakerguard_tpu.parallel.mesh import (
    make_mesh, sharded_train_step, shard_batch, replicate)
from speakerguard_tpu.cli.natural_train import validate


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
    # attacker (reference adver_train.py: FGSM or PGD)
    parser.add_argument("-attacker", default="PGD",
                        choices=["FGSM", "PGD"])
    parser.add_argument("-epsilon", type=float, default=0.002)
    parser.add_argument("-step_size", type=float, default=0.0004)
    parser.add_argument("-max_iter", type=int, default=10)
    parser.add_argument("-ratio", type=float, default=0.5)
    parser.add_argument("-evaluate_adver", action="store_true",
                        default=False)
    return parser.parse_args(argv)


def validate_adver(params, state, spk_ids, root, attack, wav_length=32000,
                   max_utts=50):
    """Adversarial validation (reference adver_train.py:85-101): attack
    val utterances against the current params, report adversarial acc."""
    from speakerguard_tpu.data.dataset import Spk251_test
    from speakerguard_tpu.ops.logmel import audionet_logmel
    from speakerguard_tpu.models.audionet import audionet_logits

    val = Spk251_test(spk_ids, root, wav_length=wav_length)
    right = total = 0
    key = jax.random.PRNGKey(123)
    for i, (wavs, labels) in enumerate(val.batches(8, drop_last=True)):
        if total >= max_utts:
            break
        x = jnp.asarray(wavs[:, 0, :])
        y = jnp.asarray(labels)
        adv = attack(params, state, x, y, jax.random.fold_in(key, i))
        logits, _, _ = audionet_logits(params, state, audionet_logmel(adv),
                                       train=False)
        right += int((jnp.argmax(logits, -1) == y).sum())
        total += len(labels)
    return right / max(total, 1)


def main(args):
    rng = np.random.default_rng(args.seed)
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

    if args.attacker == "FGSM":
        attack = make_pgd_for_training(epsilon=args.epsilon,
                                       step_size=args.epsilon, max_iter=1)
    else:
        attack = make_pgd_for_training(epsilon=args.epsilon,
                                       step_size=args.step_size,
                                       max_iter=args.max_iter)
    step = make_adver_train_step(opt, attack, ratio=args.ratio,
                                 aug_eps=args.aug_eps,
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
    ckpt_base = args.model_ckpt or "./model_file/audionet-adver"
    # file logger (reference adver_train.py has the same natural_train
    # logging pattern)
    import logging
    log_path = args.log or f"{ckpt_base}.log"
    os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
    logger = logging.getLogger("speakerguard.adver_train")
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    for h in list(logger.handlers):  # re-invocation must not duplicate lines
        logger.removeHandler(h)
        h.close()
    logger.addHandler(logging.FileHandler(log_path))
    key = jax.random.PRNGKey(args.seed)
    for i_epoch in range(args.num_epoches):
        accs_adv, accs_nor = [], []
        from speakerguard_tpu.parallel.input import prefetch
        for batch_id, (wavs, labels) in enumerate(prefetch(
                train.batches(args.batch_size, shuffle=True,
                              drop_last=args.n_devices > 1))):
            t0 = time.time()
            wavs = jnp.asarray(wavs[:, 0, :])
            if float(jnp.abs(wavs).max()) > 2:
                wavs = wavs / (2.0 ** 15)
            labels = jnp.asarray(labels)
            if mesh is not None:
                wavs = shard_batch(wavs, mesh)
                labels = shard_batch(labels, mesh)
            key, sub = jax.random.split(key)
            params, state, opt_state, loss, acc_adv, acc_nor = step(
                params, state, opt_state, wavs, labels, sub)
            accs_adv.append(float(acc_adv))
            accs_nor.append(float(acc_nor))
            print(f"Batch {batch_id}: loss={float(loss):.4f} "
                  f"acc_adv={float(acc_adv):.4f} "
                  f"acc_normal={float(acc_nor):.4f} "
                  f"time={time.time() - t0:.3f}s", end="\r")
        epoch = i_epoch + args.start_epoch
        # a ragged tail batch with int(b*ratio)==0 adversarial samples
        # reports acc_adv=nan for that batch; skip it in the epoch mean
        print(f"\nEPOCH {epoch}: Acc adv = {np.nanmean(accs_adv):.4f} "
              f"Acc normal = {np.nanmean(accs_nor):.4f}")
        logger.info("EPOCH %d/%d: Acc adv = %.6f Acc normal = %.6f", epoch,
                    args.num_epoches + args.start_epoch,
                    np.nanmean(accs_adv), np.nanmean(accs_nor))
        save_checkpoint(f"{ckpt_base}_{epoch}", params, state, opt_state,
                        epoch)
        if args.evaluate_per_epoch > 0 and \
                i_epoch % args.evaluate_per_epoch == 0:
            msg = "Val Acc: %f" % validate(params, state, spk_ids, args.root)
            if args.evaluate_adver:
                msg += ", Val Adver Acc: %f" % validate_adver(
                    params, state, spk_ids, args.root, attack)
            print(msg)
            logger.info("%s", msg)
    save_checkpoint(ckpt_base, params, state, opt_state,
                    args.num_epoches + args.start_epoch, wait=True)


if __name__ == "__main__":
    main(parse_args())
