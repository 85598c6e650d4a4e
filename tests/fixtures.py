"""Synthetic fixtures: Kaldi-format model text files and wav datasets,
written in the exact formats the reference parses (gmm.py:31-81,
ivector_extract.py:28-70, plda.py:27-51, model/utils.py:50-80)."""

import os

import numpy as np

from speakerguard_tpu.utils.audio_io import write_wav


def write_fgmm_txt(path, gconsts, weights, mic, invcov):
    c, d = mic.shape
    with open(path, "w") as f:
        f.write("<DiagGMM>\n")
        f.write("<GCONSTS> [ " + " ".join(f"{v:.6f}" for v in gconsts)
                + " ]\n")
        f.write("<WEIGHTS> [ " + " ".join(f"{v:.6f}" for v in weights)
                + " ]\n")
        f.write("<MEANS_INVCOVARS> [\n")
        for i in range(c):
            f.write("r  " + " ".join(f"{v:.6f}" for v in mic[i]) + " x\n")
        f.write("<INV_COVARS> [\n")
        for i in range(c):
            for j in range(d):
                f.write(" ".join(f"{invcov[i, j, k]:.6f}"
                                 for k in range(j + 1)) + " \n")
            f.write(" ]\n")  # per-component separator (consumed blindly)
        f.write("</DiagGMM>\n")


def write_extractor_txt(path, m, sigma_inv, offset):
    c, d, iv = m.shape
    with open(path, "w") as f:
        f.write("<w_vec> [ " + " ".join("1.0" for _ in range(c)) + " ]\n")
        f.write("<M> [\n")
        for i in range(c):
            for j in range(d - 1):
                f.write(" ".join(f"{v:.6f}" for v in m[i, j]) + "\n")
            f.write(" ".join(f"{v:.6f}" for v in m[i, d - 1]) + " ]\n")
            f.write(" [\n")  # separator consumed by the post-] readline
        f.write("<SigmaInv> [\n")
        for i in range(c):
            for j in range(d):
                f.write(" ".join(f"{sigma_inv[i, j, k]:.6f}"
                                 for k in range(j + 1)) + "\n")
            f.write(" ]\n")  # per-component separator
        f.write(f"<IvectorOffset> {offset:.6f}\n")


def write_plda_txt(path, mean, transform, psi):
    d = len(mean)
    with open(path, "w") as f:
        f.write("<Plda> [ " + " ".join(f"{v:.6f}" for v in mean) + " ]\n")
        f.write("[\n")
        for i in range(d):
            f.write("r  " + " ".join(f"{v:.6f}" for v in transform[i])
                    + " x\n")
        f.write("[ " + " ".join(f"{v:.6f}" for v in psi) + " ]\n")


def write_mean_vec(path, mean):
    with open(path, "w") as f:
        f.write("[ " + " ".join(f"{v:.6f}" for v in mean) + " ]\n")


def write_transform_txt(path, mat):
    r = mat.shape[0]
    with open(path, "w") as f:
        f.write("[\n")
        for i in range(r):
            line = " ".join(f"{v:.6f}" for v in mat[i])
            if i < r - 1:
                f.write(" " + line + " \n")
            else:
                f.write(" " + line + " ]\n")


def make_small_iv_artifacts(tmpdir, rng, c=8, d=24, iv=16, r=8):
    """Small but valid iv_plda artifact set; returns dict of paths."""
    a = rng.standard_normal((c, d, d)) * 0.1
    invcov = np.einsum("cij,ckj->cik", a, a) + np.eye(d)
    means = rng.standard_normal((c, d))
    mic = np.einsum("cij,cj->ci", invcov, means)
    _, logdet = np.linalg.slogdet(invcov)
    w = np.full(c, 1.0 / c)
    gconsts = (np.log(w) + 0.5 * logdet
               - 0.5 * (d * np.log(2 * np.pi)
                        + np.einsum("ci,ci->c", means, mic)))
    m = rng.standard_normal((c, d, iv)) * 0.05
    a2 = rng.standard_normal((c, d, d)) * 0.1
    sig = np.einsum("cij,ckj->cik", a2, a2) + np.eye(d)
    pmean = rng.standard_normal(r) * 0.1
    ptr, _ = np.linalg.qr(rng.standard_normal((r, r)))
    psi = np.abs(rng.standard_normal(r)) + 0.5
    emb_mean = rng.standard_normal(iv) * 0.1
    lda = rng.standard_normal((r, iv + 1)) * 0.05

    paths = {k: os.path.join(tmpdir, n) for k, n in [
        ("gmm", "final_ubm.txt"), ("extractor", "final_ie.txt"),
        ("plda", "plda.txt"), ("mean", "mean.vec"),
        ("transform", "transform.txt")]}
    write_fgmm_txt(paths["gmm"], gconsts, w, mic, invcov)
    write_extractor_txt(paths["extractor"], m, sig, 1.0)
    write_plda_txt(paths["plda"], pmean, ptr, psi)
    write_mean_vec(paths["mean"], emb_mean)
    write_transform_txt(paths["transform"], lda)
    arrays = dict(gconsts=gconsts, weights=w, mic=mic, invcov=invcov,
                  m=m, sig=sig, pmean=pmean, ptr=ptr, psi=psi,
                  emb_mean=emb_mean, lda=lda)
    return paths, arrays


def make_wav_dataset(tmpdir, rng, name="TinySpk", n_spks=3, utts_per_spk=2,
                     length=8000):
    root = os.path.join(tmpdir, name)
    for s in range(n_spks):
        spk = f"spk{s}"
        os.makedirs(os.path.join(root, spk), exist_ok=True)
        for u in range(utts_per_spk):
            wav = (rng.standard_normal(length) * 0.1).astype(np.float32)
            write_wav(os.path.join(root, spk, f"{spk}-{u}.wav"), wav)
    return tmpdir, name, [f"spk{s}" for s in range(n_spks)]
