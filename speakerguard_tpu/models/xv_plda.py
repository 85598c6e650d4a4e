"""x-vector TDNN + PLDA speaker recognition system (TPU-native).

Re-design of reference model/xv_plda.py: MFCC (num_ceps=30) -> sliding CMVN
-> TDNN embedding -> mean-sub -> LDA -> length-norm -> PLDA, all batched.

Feature flags (xv_plda.py:45-47): 0=wav, 1=raw MFCC, 2=CMVN (no deltas).
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from speakerguard_tpu.models.base import SRSModel, NEG_INF
from speakerguard_tpu.models import plda as plda_mod
from speakerguard_tpu.models import ivector as iv_mod
from speakerguard_tpu.models.tdnn import (
    TDNNParams, random_tdnn, tdnn_embedding, load_tdnn_from_torch_state)
from speakerguard_tpu.ops.kaldi_mfcc import kaldi_mfcc, XV_PLDA_MFCC
from speakerguard_tpu.ops.cmvn import sliding_cmvn
from speakerguard_tpu.utils import kaldi_io


class XvPldaParams(NamedTuple):
    tdnn: TDNNParams
    plda: plda_mod.PLDAParams
    emb_mean: jax.Array       # (512,)
    transform_mat: jax.Array  # (R, 513) LDA affine


def random_xv_plda_params(rng: np.random.Generator, reduced_dim: int = 150
                          ) -> XvPldaParams:
    return XvPldaParams(
        tdnn=random_tdnn(rng),
        plda=plda_mod.random_plda(rng, reduced_dim),
        emb_mean=jnp.asarray(rng.standard_normal(512) * 0.1, jnp.float32),
        transform_mat=jnp.asarray(
            rng.standard_normal((reduced_dim, 513)) * 0.05, jnp.float32),
    )


def load_xv_plda_params(extractor_ckpt, plda_file, mean_file,
                        transform_mat_file) -> XvPldaParams:
    if isinstance(extractor_ckpt, dict):
        tdnn = load_tdnn_from_torch_state(extractor_ckpt)
    else:
        import torch  # torch-cpu: only used to deserialize reference ckpts
        tdnn = load_tdnn_from_torch_state(
            torch.load(extractor_ckpt, map_location="cpu"))
    p = kaldi_io.parse_plda_file(plda_file)
    return XvPldaParams(
        tdnn=tdnn,
        plda=plda_mod.build_plda(p["mean"], p["transform"], p["psi"]),
        emb_mean=jnp.asarray(kaldi_io.parse_mean_file(mean_file), jnp.float32),
        transform_mat=jnp.asarray(
            kaldi_io.parse_transform_mat_file(transform_mat_file),
            jnp.float32),
    )


def process_emb(params: XvPldaParams, emb: jnp.ndarray) -> jnp.ndarray:
    """Identical post-processing chain to iv_plda (reference inherits it)."""
    x = emb - params.emb_mean
    w, b = params.transform_mat[:, :-1], params.transform_mat[:, -1]
    x = jnp.einsum("ri,bi->br", w, x,
                   precision=jax.lax.Precision.HIGHEST) + b
    r = x.shape[-1]
    x = iv_mod.length_normalize(x, jnp.sqrt(jnp.asarray(float(r))))
    return plda_mod.transform_ivector(params.plda, x, num_examples=1,
                                      simple_length_norm=False,
                                      normalize_length=True)


class XvPlda(SRSModel):
    allowed_flags = (0, 1, 2)
    range_type = "origin"

    def __init__(self, params: XvPldaParams, model_file: str | None = None,
                 threshold: float | None = None, mfcc_config=XV_PLDA_MFCC):
        self.params = params
        self.mfcc_config = mfcc_config
        self.threshold = threshold if threshold is not None else NEG_INF
        self.spk_ids = None
        self.enroll_embs = None
        if model_file is not None:
            (n, self.spk_ids, self.z_norm_means, self.z_norm_stds,
             embs) = kaldi_io.parse_enroll_model_file(model_file)
            self.enroll_embs = jnp.asarray(embs, jnp.float32)

    def set_enrollment(self, spk_ids, enroll_embs, z_norm_means=None,
                       z_norm_stds=None):
        self.spk_ids = list(spk_ids)
        self.enroll_embs = jnp.asarray(enroll_embs, jnp.float32)
        self.z_norm_means = z_norm_means
        self.z_norm_stds = z_norm_stds

    def _raw(self, wav, rng=None, p=None, fast=False):
        # attack-gradient graphs: reduced-pass DFT matmuls (see iv_plda._raw)
        from speakerguard_tpu.models.base import fast_active, \
            fast_dft_precision
        prec = fast_dft_precision() if fast and fast_active() else None
        return kaldi_mfcc(wav, self.mfcc_config, rng=rng, precision=prec)

    def _feat_step(self, feats, ori_flag, p=None):
        if ori_flag == 1:
            return sliding_cmvn(feats)
        raise ValueError(ori_flag)

    def _embedding_from_top(self, feats, p=None, fast=False,
                            fast_ctx=None):
        from speakerguard_tpu.models.base import fast_active
        p = p if p is not None else self.params
        emb = tdnn_embedding(p.tdnn, feats, fast=fast and fast_active())
        return process_emb(p, emb)

    def _scores_from_emb(self, emb, enroll_embs=None, p=None):
        p = p if p is not None else self.params
        enroll = enroll_embs if enroll_embs is not None else self.enroll_embs
        assert enroll is not None, "model has no enrolled speakers"
        return plda_mod.llr_scores(p.plda, enroll, emb, num_examples=1)
