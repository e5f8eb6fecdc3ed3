"""LightGlue attention matcher as a JAX/Flax forward pass.

Re-implementation of the LightGlue architecture (Lindenberger et al., ICCV
2023; reference uses the torch version at matching.py:20,122) designed for
TPU batching:

  - 9 alternating self/cross attention layers, 4 heads, dim 256, rotary
    positional encoding from a learnable Fourier projection of normalized
    keypoint locations — every attention is a dense (N, N) MXU matmul;
  - the adaptive early-exit / point-pruning path of the original is
    deliberately NOT used: it is a serial-latency trick that creates
    data-dependent shapes. On TPU we run all 9 layers over a *batch of
    pairs* instead — higher throughput at equal quality (the exit check
    only skips work when confidence is already high);
  - dual-softmax + matchability assignment identical to the original, so
    released checkpoints converted by `convert_torch_state_dict` are
    numerically interchangeable (parity-tested against the torch reference
    implementation with random weights in tests/test_lightglue.py).

Weights: the published checkpoints cannot be downloaded in this offline
environment; with a checkpoint file present, `load_torch_checkpoint`
converts it. Without weights the pipeline uses the classical frontend
(features/, matching/mnn.py).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def normalize_keypoints(kpts: jnp.ndarray, size: jnp.ndarray) -> jnp.ndarray:
    """Scale pixel keypoints into [-1, 1] by the image half-diagonal axis
    (matches the torch reference `normalize_keypoints`)."""
    shift = size / 2.0
    scale = jnp.max(size, axis=-1, keepdims=True) / 2.0
    return (kpts - shift[..., None, :]) / scale[..., None]


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1 = x[..., 0]
    x2 = x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(*x.shape[:-2], -1)


def apply_rotary(freqs: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return t * freqs[0] + rotate_half(t) * freqs[1]


class FourierPosEnc(nn.Module):
    """LearnableFourierPositionalEncoding: x (..., 2) -> (2, ..., head_dim)
    cos/sin pair, repeat-interleaved by 2."""

    f_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        proj = nn.Dense(self.f_dim // 2, use_bias=False, name="Wr")(x)
        cos = jnp.cos(proj)
        sin = jnp.sin(proj)
        emb = jnp.stack([cos, sin], axis=0)[..., None, :, :]  # (2, ..., 1, N, F/2)
        return jnp.repeat(emb, 2, axis=-1)


class SelfBlock(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, enc: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        h = self.heads
        d = self.dim
        hd = d // h
        qkv = nn.Dense(3 * d, name="Wqkv")(x)  # (B, N, 3d)
        # torch layout: unflatten(-1, (h, hd, 3)) -> per-head interleave
        qkv = qkv.reshape(*qkv.shape[:-1], h, hd, 3)
        qkv = jnp.moveaxis(qkv, -4, -3)  # (B, h, N, hd, 3)
        q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]
        q = apply_rotary(enc, q)
        k = apply_rotary(enc, k)
        logits = jnp.einsum("...id,...jd->...ij", q, k) / jnp.sqrt(hd)
        if mask is not None:
            # Padded (invalid) keypoints must not influence real ones: the
            # torch reference runs exact-length tensors; our fixed-shape
            # batches mask the attention keys instead.
            logits = jnp.where(mask[..., None, None, :] > 0, logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("...ij,...jd->...id", attn, v)  # (B, h, N, hd)
        ctx = jnp.moveaxis(ctx, -3, -2).reshape(*x.shape[:-1], d)
        msg = nn.Dense(d, name="out_proj")(ctx)
        y = jnp.concatenate([x, msg], axis=-1)
        y = nn.Dense(2 * d, name="ffn_0")(y)
        y = nn.LayerNorm(name="ffn_1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(d, name="ffn_3")(y)
        return x + y


class CrossBlock(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x0: jnp.ndarray, x1: jnp.ndarray,
                 mask0: Optional[jnp.ndarray] = None,
                 mask1: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = self.heads
        d = self.dim
        hd = d // h
        to_qk = nn.Dense(d, name="to_qk")
        to_v = nn.Dense(d, name="to_v")
        to_out = nn.Dense(d, name="to_out")
        ffn_0 = nn.Dense(2 * d, name="ffn_0")
        ffn_1 = nn.LayerNorm(name="ffn_1")
        ffn_3 = nn.Dense(d, name="ffn_3")

        def split(t):
            return jnp.moveaxis(t.reshape(*t.shape[:-1], h, hd), -3, -2)  # (B,h,N,hd)

        qk0 = split(to_qk(x0))
        qk1 = split(to_qk(x1))
        v0 = split(to_v(x0))
        v1 = split(to_v(x1))
        scale = hd**-0.5
        sim = jnp.einsum("...id,...jd->...ij", qk0 * scale**0.5, qk1 * scale**0.5)
        sim01 = sim if mask1 is None else jnp.where(
            mask1[..., None, None, :] > 0, sim, -1e9)
        sim10 = jnp.swapaxes(sim, -1, -2)
        if mask0 is not None:
            sim10 = jnp.where(mask0[..., None, None, :] > 0, sim10, -1e9)
        attn01 = jax.nn.softmax(sim01, axis=-1)
        attn10 = jax.nn.softmax(sim10, axis=-1)
        m0 = jnp.einsum("...ij,...jd->...id", attn01, v1)
        m1 = jnp.einsum("...ji,...jd->...id", jnp.swapaxes(attn10, -1, -2), v0)

        def merge(t, like):
            return jnp.moveaxis(t, -3, -2).reshape(*like.shape[:-1], d)

        m0 = to_out(merge(m0, x0))
        m1 = to_out(merge(m1, x1))

        def ffn(x, m):
            y = jnp.concatenate([x, m], axis=-1)
            return x + ffn_3(jax.nn.gelu(ffn_1(ffn_0(y)), approximate=False))

        return ffn(x0, m0), ffn(x1, m1)


class MatchAssignment(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, d0: jnp.ndarray, d1: jnp.ndarray,
                 mask0: Optional[jnp.ndarray] = None,
                 mask1: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        proj = nn.Dense(self.dim, name="final_proj")
        match0 = nn.Dense(1, name="matchability")
        md0 = proj(d0) / self.dim**0.25
        md1 = proj(d1) / self.dim**0.25
        sim = jnp.einsum("bmd,bnd->bmn", md0, md1)
        if mask0 is not None:
            sim = jnp.where(mask0[..., :, None] > 0, sim, -1e9)
        if mask1 is not None:
            sim = jnp.where(mask1[..., None, :] > 0, sim, -1e9)
        z0 = match0(d0)  # (B, M, 1)
        z1 = match0(d1)
        cert = jax.nn.log_sigmoid(z0) + jnp.swapaxes(jax.nn.log_sigmoid(z1), -1, -2)
        s0 = jax.nn.log_softmax(sim, axis=2)
        s1 = jnp.swapaxes(jax.nn.log_softmax(jnp.swapaxes(sim, -1, -2), axis=2), -1, -2)
        b, m, n = sim.shape
        inner = s0 + s1 + cert
        # Hard-mask padded slots: log_softmax of a uniformly masked row is
        # log(1/n), not -inf, and garbage descriptors can carry high
        # matchability — without this, invalid-invalid pairs decode as
        # confident matches.
        if mask0 is not None:
            inner = jnp.where(mask0[..., :, None] > 0, inner, -1e9)
        if mask1 is not None:
            inner = jnp.where(mask1[..., None, :] > 0, inner, -1e9)
        scores = jnp.zeros((b, m + 1, n + 1), sim.dtype)
        scores = scores.at[:, :m, :n].set(inner)
        scores = scores.at[:, :-1, -1].set(jax.nn.log_sigmoid(-z0[..., 0]))
        scores = scores.at[:, -1, :-1].set(jax.nn.log_sigmoid(-z1[..., 0]))
        return scores


class LightGlue(nn.Module):
    """Full matcher. Input descriptors (B, N, input_dim) + pixel keypoints
    + image sizes (W, H); output log-assignment matrix (B, M+1, N+1)."""

    input_dim: int = 128       # DISK descriptors
    dim: int = 256
    n_layers: int = 9
    heads: int = 4

    @nn.compact
    def __call__(self, kpts0, desc0, size0, kpts1, desc1, size1,
                 mask0: Optional[jnp.ndarray] = None,
                 mask1: Optional[jnp.ndarray] = None):
        d = self.dim
        hd = d // self.heads
        k0 = normalize_keypoints(kpts0, size0)
        k1 = normalize_keypoints(kpts1, size1)
        if self.input_dim != d:
            proj = nn.Dense(d, name="input_proj")
            x0 = proj(desc0)
            x1 = proj(desc1)
        else:
            x0, x1 = desc0, desc1
        posenc = FourierPosEnc(hd, name="posenc")
        enc0 = posenc(k0)
        enc1 = posenc(k1)
        for i in range(self.n_layers):
            sb = SelfBlock(d, self.heads, name=f"self_attn_{i}")  # shared for x0/x1
            x0, x1 = sb(x0, enc0, mask0), sb(x1, enc1, mask1)
            x0, x1 = CrossBlock(d, self.heads, name=f"cross_attn_{i}")(x0, x1, mask0, mask1)
        scores = MatchAssignment(d, name=f"log_assignment_{self.n_layers - 1}")(
            x0, x1, mask0, mask1)
        return scores


def filter_matches(scores: jnp.ndarray, threshold: float = 0.1):
    """Mutual-argmax + threshold decoding of the (B, M+1, N+1) log
    assignment (torch reference `filter_matches`). Returns
    (m0 (B, M), m1 (B, N), mscores0, mscores1) with -1 for unmatched."""
    inner = scores[:, :-1, :-1]
    m0 = jnp.argmax(inner, axis=2)
    m1 = jnp.argmax(inner, axis=1)
    max0 = jnp.max(inner, axis=2)
    idx0 = jnp.arange(inner.shape[1])[None]
    idx1 = jnp.arange(inner.shape[2])[None]
    mutual0 = idx0 == jnp.take_along_axis(m1, m0, axis=1)
    mutual1 = idx1 == jnp.take_along_axis(m0, m1, axis=1)
    mscores0 = jnp.where(mutual0, jnp.exp(max0), 0.0)
    mscores1 = jnp.where(mutual1, jnp.take_along_axis(mscores0, m1, axis=1), 0.0)
    valid0 = mutual0 & (mscores0 > threshold)
    valid1 = mutual1 & jnp.take_along_axis(valid0, m1, axis=1)
    return (
        jnp.where(valid0, m0, -1),
        jnp.where(valid1, m1, -1),
        mscores0,
        mscores1,
    )


# ---------------------------------------------------------------------------
# Torch checkpoint conversion
# ---------------------------------------------------------------------------

def _dense(w, b=None) -> Dict[str, np.ndarray]:
    out = {"kernel": np.asarray(w).T}
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def convert_torch_state_dict(sd: Dict[str, Any], n_layers: int = 9) -> Dict[str, Any]:
    """Map a torch LightGlue state_dict (released checkpoint or the
    reference implementation's random init) onto this module's params."""
    g = lambda k: sd[k].detach().cpu().numpy() if hasattr(sd[k], "detach") else np.asarray(sd[k])
    p: Dict[str, Any] = {}
    if "input_proj.weight" in sd:
        p["input_proj"] = _dense(g("input_proj.weight"), g("input_proj.bias"))
    p["posenc"] = {"Wr": _dense(g("posenc.Wr.weight"))}
    for i in range(n_layers):
        sa = f"self_attn.{i}"
        p[f"self_attn_{i}"] = {
            "Wqkv": _dense(g(f"{sa}.Wqkv.weight"), g(f"{sa}.Wqkv.bias")),
            "out_proj": _dense(g(f"{sa}.out_proj.weight"), g(f"{sa}.out_proj.bias")),
            "ffn_0": _dense(g(f"{sa}.ffn.0.weight"), g(f"{sa}.ffn.0.bias")),
            "ffn_1": {"scale": g(f"{sa}.ffn.1.weight"), "bias": g(f"{sa}.ffn.1.bias")},
            "ffn_3": _dense(g(f"{sa}.ffn.3.weight"), g(f"{sa}.ffn.3.bias")),
        }
        ca = f"cross_attn.{i}"
        p[f"cross_attn_{i}"] = {
            "to_qk": _dense(g(f"{ca}.to_qk.weight"), g(f"{ca}.to_qk.bias")),
            "to_v": _dense(g(f"{ca}.to_v.weight"), g(f"{ca}.to_v.bias")),
            "to_out": _dense(g(f"{ca}.to_out.weight"), g(f"{ca}.to_out.bias")),
            "ffn_0": _dense(g(f"{ca}.ffn.0.weight"), g(f"{ca}.ffn.0.bias")),
            "ffn_1": {"scale": g(f"{ca}.ffn.1.weight"), "bias": g(f"{ca}.ffn.1.bias")},
            "ffn_3": _dense(g(f"{ca}.ffn.3.weight"), g(f"{ca}.ffn.3.bias")),
        }
    la = f"log_assignment.{n_layers - 1}"
    p[f"log_assignment_{n_layers - 1}"] = {
        "final_proj": _dense(g(f"{la}.final_proj.weight"), g(f"{la}.final_proj.bias")),
        "matchability": _dense(g(f"{la}.matchability.weight"), g(f"{la}.matchability.bias")),
    }
    return {"params": p}


def load_torch_checkpoint(path: str, n_layers: int = 9) -> Dict[str, Any]:
    import torch

    sd = torch.load(path, map_location="cpu")
    return convert_torch_state_dict(sd, n_layers)
