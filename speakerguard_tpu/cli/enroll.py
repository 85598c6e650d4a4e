"""Enrollment CLI (re-design of reference enroll.py): builds speaker models
by averaging embeddings over enrollment utterances, computes z-norm stats
from non-target test scores, writes per-speaker and combined model files.

Embeddings are saved as .npy (the torch.save of the reference)."""

import os

import numpy as np
import jax.numpy as jnp

from speakerguard_tpu.cli.common import (add_defense_args,
                                         add_eval_dither_arg,
                                         add_system_subparsers, build_model,
                                         eval_rng_stream)
from speakerguard_tpu.utils.audio_io import read_wav
from speakerguard_tpu.utils.kaldi_io import write_enroll_model_file


def parse_args(argv=None):
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument("-model_dir", default="model_file")
    parser.add_argument("-root", default="data")
    add_defense_args(parser)
    add_eval_dither_arg(parser)
    add_system_subparsers(parser, with_model_file=False)
    return parser.parse_args(argv)


def main(args):
    base, model, defense_name = build_model(args, need_enroll=False)

    des_path = os.path.join(args.model_dir, args.system_type)
    os.makedirs(des_path, exist_ok=True)

    enroll_dir = os.path.join(args.root, "Spk10_enroll")
    test_dir = os.path.join(args.root, "Spk10_test")
    rngs = eval_rng_stream(args)
    call_idx = 0
    model_info = []
    for spk_id in sorted(os.listdir(enroll_dir)):
        spk_dir = os.path.join(enroll_dir, spk_id)
        if not os.path.isdir(spk_dir):
            continue
        embs = []
        for audio_name in sorted(os.listdir(spk_dir)):
            wav = read_wav(os.path.join(spk_dir, audio_name)) * (2.0 ** 15)
            emb = model.embedding(jnp.asarray(wav[None]), rng=rngs(call_idx))
            call_idx += 1
            embs.append(np.asarray(emb)[0])
        emb = np.mean(np.stack(embs), axis=0, keepdims=True)  # (1, D)
        suffix = (args.system_type if defense_name is None
                  else f"{args.system_type}-{defense_name}")
        emb_path = os.path.join(des_path, f"{spk_id}.{suffix}.npy")
        np.save(emb_path, emb)

        # z-norm stats from other speakers' test utterances
        nontarget_scores = []
        for test_spk in sorted(os.listdir(test_dir)):
            if test_spk == spk_id:
                continue
            tdir = os.path.join(test_dir, test_spk)
            if not os.path.isdir(tdir):
                continue
            for name in sorted(os.listdir(tdir)):
                wav = read_wav(os.path.join(tdir, name)) * (2.0 ** 15)
                score = float(np.asarray(model.score(
                    jnp.asarray(wav[None]), enroll_embs=jnp.asarray(emb),
                    rng=rngs(call_idx))).flatten()[0])
                call_idx += 1
                nontarget_scores.append(score)
                print(spk_id, name, score)
        z_mean = float(np.mean(nontarget_scores))
        z_std = float(np.std(nontarget_scores))
        info = f"{spk_id} {emb_path} {z_mean} {z_std}"
        model_info.append(info)
        tag = (f"speaker_model_{args.system_type}_{spk_id}"
               if defense_name is None else
               f"speaker_model_{args.system_type}_{defense_name}_{spk_id}")
        np.savetxt(os.path.join(des_path, tag), [info], fmt="%s")

    tag = (f"speaker_model_{args.system_type}" if defense_name is None else
           f"speaker_model_{args.system_type}_{defense_name}")
    np.savetxt(os.path.join(des_path, tag), model_info, fmt="%s")
    print("wrote", os.path.join(des_path, tag))


if __name__ == "__main__":
    main(parse_args())
