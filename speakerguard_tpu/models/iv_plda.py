"""GMM-UBM i-vector + PLDA speaker recognition system (TPU-native).

Re-design of reference model/iv_plda.py: the wav -> MFCC -> delta -> CMVN ->
Baum-Welch stats -> ivector -> LDA -> length-norm -> PLDA pipeline as one
batched, differentiable, jittable function.  The reference loops per
utterance at every stage (iv_plda.py:201, :253, :302, :385, :401); here the
batch axis is a real array axis end to end.

Feature flags (iv_plda.py:75-77): 0=wav, 1=raw MFCC, 2=+deltas, 3=CMVN.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from speakerguard_tpu.models.base import SRSModel, NEG_INF, fast_active
from speakerguard_tpu.models import gmm as gmm_mod
from speakerguard_tpu.models import ivector as iv_mod
from speakerguard_tpu.models import plda as plda_mod
from speakerguard_tpu.ops.kaldi_mfcc import kaldi_mfcc, IV_PLDA_MFCC
from speakerguard_tpu.ops.delta import add_delta
from speakerguard_tpu.ops.cmvn import sliding_cmvn
from speakerguard_tpu.utils import kaldi_io


class IvPldaParams(NamedTuple):
    fgmm: gmm_mod.FullGMMParams
    extractor: iv_mod.IvectorExtractorParams
    plda: plda_mod.PLDAParams
    emb_mean: jax.Array       # (IV,) global ivector mean
    transform_mat: jax.Array  # (R, IV+1) LDA affine transform


def random_iv_plda_params(rng: np.random.Generator, num_gaussians: int = 2048,
                          dim: int = 72, ivector_dim: int = 600,
                          reduced_dim: int = 200) -> IvPldaParams:
    """Random fixture mirroring the reference's random=True constructors.
    Default dim=72 = num_ceps(24) x 3 (base+delta+delta2), consistent with
    the default MFCC config (the reference's random=True uses 60, which is
    inconsistent with its own frontend and only ever used standalone)."""
    return IvPldaParams(
        fgmm=gmm_mod.random_gmm(rng, num_gaussians, dim),
        extractor=iv_mod.random_extractor(rng, num_gaussians, dim, ivector_dim),
        plda=plda_mod.random_plda(rng, reduced_dim),
        emb_mean=jnp.asarray(rng.standard_normal(ivector_dim) * 0.1,
                             jnp.float32),
        transform_mat=jnp.asarray(
            rng.standard_normal((reduced_dim, ivector_dim + 1)) * 0.05,
            jnp.float32),
    )


def load_iv_plda_params(fgmm_file, extractor_file, plda_file, mean_file,
                        transform_mat_file) -> IvPldaParams:
    g = kaldi_io.parse_fgmm_file(fgmm_file)
    e = kaldi_io.parse_extractor_file(extractor_file)
    p = kaldi_io.parse_plda_file(plda_file)
    return IvPldaParams(
        fgmm=gmm_mod.build_gmm(g["gconsts"], g["weights"],
                               g["means_invcovars"], g["invcovars"]),
        extractor=iv_mod.build_extractor(e["extractor_matrix"],
                                         e["sigma_inv"], float(e["offset"])),
        plda=plda_mod.build_plda(p["mean"], p["transform"], p["psi"]),
        emb_mean=jnp.asarray(kaldi_io.parse_mean_file(mean_file), jnp.float32),
        transform_mat=jnp.asarray(
            kaldi_io.parse_transform_mat_file(transform_mat_file),
            jnp.float32),
    )


# ----- pure functions ------------------------------------------------------

def process_emb(params: IvPldaParams, ivec: jnp.ndarray) -> jnp.ndarray:
    """mean-sub -> LDA affine reduce -> length-norm -> PLDA transform
    (reference iv_plda.py:411-443), batched over (B, IV)."""
    x = ivec - params.emb_mean
    w, b = params.transform_mat[:, :-1], params.transform_mat[:, -1]
    x = jnp.einsum("ri,bi->br", w, x,
                   precision=jax.lax.Precision.HIGHEST) + b
    r = x.shape[-1]
    x = iv_mod.length_normalize(x, jnp.sqrt(jnp.asarray(float(r))))
    return plda_mod.transform_ivector(params.plda, x, num_examples=1,
                                      simple_length_norm=False,
                                      normalize_length=True)


class IvFastContext(NamedTuple):
    """Per-attack-run frozen top-K Gaussian selection: the shared GMM
    selection plus the matching i-vector extractor slices (the whole
    GMM -> stats -> i-vector chain runs in the selected subspace; see
    gmm.make_topk_context / ivector.make_topk_slices)."""
    gmm: gmm_mod.GmmTopKContext
    iv: iv_mod.IvectorTopK


def make_fast_context(params: IvPldaParams, feats: jnp.ndarray,
                      k: int) -> "IvFastContext | None":
    """Shared top-K selection from (clean) CMVN features + extractor
    slices.  None when selection is a no-op (K<=0 or K>=C)."""
    g = gmm_mod.make_topk_context(params.fgmm, feats, k)
    if g is None:
        return None
    return IvFastContext(gmm=g,
                         iv=iv_mod.make_topk_slices(params.extractor, g.sel))


def embedding_from_cmvn(params: IvPldaParams, feats: jnp.ndarray,
                        fast=False, topk_ctx: "IvFastContext | None" = None
                        ) -> jnp.ndarray:
    """(B, T, D) CMVN features -> (B, R) processed embeddings.

    fast=True runs the bf16 attack-gradient variant of the GMM stats and
    i-vector extraction (see gmm._loglike_fast / ivector._quad_contract_fast
    for why); scores drift at the bf16 level, so callers must keep the
    final success evaluation on the exact path.  topk_ctx additionally
    restricts the GMM stats AND the i-vector contraction to a frozen
    batch-shared component selection (make_fast_context)."""
    assert feats.shape[-1] == params.fgmm.dim, (
        f"feature dim {feats.shape[-1]} != UBM dim {params.fgmm.dim}; "
        "check num_ceps (features are num_ceps*3 after deltas)")
    zeroth, first = gmm_mod.zeroth_first_stats(
        params.fgmm, feats, fast=fast,
        topk_ctx=None if topk_ctx is None else topk_ctx.gmm)
    ivec = iv_mod.extract_ivectors(
        params.extractor, zeroth, first, fast=fast,
        topk=None if topk_ctx is None else topk_ctx.iv)
    return process_emb(params, ivec)


def scores_from_emb(params: IvPldaParams, emb: jnp.ndarray,
                    enroll_embs: jnp.ndarray) -> jnp.ndarray:
    return plda_mod.llr_scores(params.plda, enroll_embs, emb, num_examples=1)


# ----- model class ----------------------------------------------------------

class IvPlda(SRSModel):
    allowed_flags = (0, 1, 2, 3)
    range_type = "origin"

    def __init__(self, params: IvPldaParams, model_file: str | None = None,
                 threshold: float | None = None, mfcc_config=IV_PLDA_MFCC):
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
        # attack-gradient graphs run the DFT matmuls at reduced passes
        # (SG_DFT_FAST_PRECISION, default HIGH=3-pass vs HIGHEST=6-pass);
        # the exact final eval keeps parity
        from speakerguard_tpu.models.base import fast_dft_precision
        prec = fast_dft_precision() if fast and fast_active() else None
        return kaldi_mfcc(wav, self.mfcc_config, rng=rng, precision=prec)

    def _feat_step(self, feats, ori_flag, p=None):
        if ori_flag == 1:
            return add_delta(feats)
        if ori_flag == 2:
            return sliding_cmvn(feats)
        raise ValueError(ori_flag)

    def _embedding_from_top(self, feats, p=None, fast=False, fast_ctx=None):
        return embedding_from_cmvn(p if p is not None else self.params,
                                   feats, fast=fast and fast_active(),
                                   topk_ctx=fast_ctx)

    def fast_context(self, x, rng=None, params=None):
        """Frozen batch-shared top-K Gaussian selection for an attack run
        (SG_GMM_TOPK=K; see make_fast_context).  Computed from the
        run's clean input on the fast frontend; returns None when
        disabled so attack graphs are unchanged."""
        k = gmm_mod.topk_k()
        if k <= 0 or not fast_active():
            return None
        p = self.resolve_params(params)
        feats = self.compute_feat(x, flag=self.allowed_flags[-1], rng=rng,
                                  params=p, fast=True)
        return make_fast_context(p, feats, k)

    def _scores_from_emb(self, emb, enroll_embs=None, p=None):
        enroll = enroll_embs if enroll_embs is not None else self.enroll_embs
        assert enroll is not None, "model has no enrolled speakers"
        return scores_from_emb(p if p is not None else self.params, emb,
                               enroll)
