"""Shared CLI plumbing: model/defense construction, nested subparsers.

Preserves the reference's positional CLI grammar
(`<common args> <system_type> <model args> <attack> <attack args>`,
reference attackMain.py:32-152) over the TPU-native models.
"""

import argparse

import numpy as np

from speakerguard_tpu.defenses.registry import parser_defense
from speakerguard_tpu.models.defended import DefendedModel


def add_defense_args(parser):
    parser.add_argument("-defense", nargs="+", default=None)
    parser.add_argument("-defense_param", nargs="+", default=None)
    parser.add_argument("-defense_flag", nargs="+", default=None, type=int)
    parser.add_argument("-defense_order", default="sequential",
                        choices=["sequential", "average"])


def add_eval_dither_arg(parser):
    """-eval_dither restores the reference's stochastic evaluation: the
    reference applies Kaldi-MFCC dither=1.0 unconditionally inside the
    frontend (reference model/iv_plda.py:212-215), so its EER/threshold
    statistics are computed on dithered features.  Our frontends apply
    dither only when an rng is threaded in, making evaluation deterministic
    by default; pass this flag for reference-parity experiments."""
    parser.add_argument("-eval_dither", action="store_true", default=False)
    parser.add_argument("-eval_dither_seed", type=int, default=0)


def eval_rng_stream(args):
    """Returns `i -> (PRNG key or None)` for eval CLI model calls: None
    (deterministic, the default) unless -eval_dither was passed."""
    if not getattr(args, "eval_dither", False):
        return lambda i: None
    import jax
    key = jax.random.PRNGKey(getattr(args, "eval_dither_seed", 0))
    return lambda i: jax.random.fold_in(key, i)


def add_system_subparsers(parser, with_model_file=True):
    sub = parser.add_subparsers(dest="system_type")
    iv = sub.add_parser("iv_plda")
    iv.add_argument("-gmm", default="pre-trained-models/iv_plda/final_ubm.txt")
    iv.add_argument("-extractor",
                    default="pre-trained-models/iv_plda/final_ie.txt")
    iv.add_argument("-plda", default="pre-trained-models/iv_plda/plda.txt")
    iv.add_argument("-mean", default="pre-trained-models/iv_plda/mean.vec")
    iv.add_argument("-transform",
                    default="pre-trained-models/iv_plda/transform.txt")
    if with_model_file:
        iv.add_argument("-model_file",
                        default="model_file/iv_plda/speaker_model_iv_plda")

    xv = sub.add_parser("xv_plda")
    xv.add_argument("-extractor",
                    default="pre-trained-models/xv_plda/xvecTDNN_origin.ckpt")
    xv.add_argument("-plda", default="pre-trained-models/xv_plda/plda.txt")
    xv.add_argument("-mean", default="pre-trained-models/xv_plda/mean.vec")
    xv.add_argument("-transform",
                    default="pre-trained-models/xv_plda/transform.txt")
    if with_model_file:
        xv.add_argument("-model_file",
                        default="model_file/xv_plda/speaker_model_xv_plda")

    an = sub.add_parser("audionet_csine")
    an.add_argument("-extractor", default=None)
    an.add_argument("-label_encoder",
                    default="./label-encoder-audionet-Spk251_test.txt")
    return iv, xv, an


def build_model(args, need_enroll=True):
    """Construct the (defended) model from parsed CLI args."""
    threshold = getattr(args, "threshold", None)
    if args.system_type == "iv_plda":
        from speakerguard_tpu.models.iv_plda import (
            IvPlda, load_iv_plda_params)
        from speakerguard_tpu.ops.kaldi_mfcc import MfccConfig
        params = load_iv_plda_params(args.gmm, args.extractor, args.plda,
                                     args.mean, args.transform)
        # infer num_ceps from the UBM dim (features are ceps*3 post-delta)
        num_ceps = params.fgmm.dim // 3
        assert num_ceps * 3 == params.fgmm.dim, \
            f"UBM dim {params.fgmm.dim} is not divisible by 3"
        base = IvPlda(params,
                      model_file=getattr(args, "model_file", None)
                      if need_enroll else None,
                      threshold=threshold,
                      mfcc_config=MfccConfig(num_ceps=num_ceps))
    elif args.system_type == "xv_plda":
        from speakerguard_tpu.models.xv_plda import (
            XvPlda, load_xv_plda_params)
        params = load_xv_plda_params(args.extractor, args.plda, args.mean,
                                     args.transform)
        base = XvPlda(params,
                      model_file=getattr(args, "model_file", None)
                      if need_enroll else None,
                      threshold=threshold)
    elif args.system_type == "audionet_csine":
        from speakerguard_tpu.models.audionet import (
            AudioNet, parse_label_encoder)
        from speakerguard_tpu.models.training import load_checkpoint
        spk_ids = (parse_label_encoder(args.label_encoder)
                   if args.label_encoder else None)
        assert args.extractor is not None, "audionet needs a checkpoint"
        try:
            params, state, _, _ = load_checkpoint(args.extractor)
        except Exception:
            # reference checkpoints are torch state dicts
            import torch
            from speakerguard_tpu.models.audionet import (
                load_audionet_from_torch_state)
            params, state = load_audionet_from_torch_state(
                torch.load(args.extractor, map_location="cpu"))
        base = AudioNet(params, state, spk_ids=spk_ids)
    else:
        raise NotImplementedError("Unsupported system type")

    defense, defense_name = parser_defense(
        args.defense, args.defense_param, args.defense_flag,
        args.defense_order)
    model = DefendedModel(base, defense=defense, order=args.defense_order)
    return base, model, defense_name
