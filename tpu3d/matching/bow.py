"""Bag-of-visual-words retrieval: k-means codebook, vector quantization,
tf-idf scoring — all on-device.

Replaces scipy.cluster.vq (ref bow.py:23, matching.py:27) and the O(N²)
host-side cosine loop (matching.py:52-59). k-means is Lloyd's algorithm
under jit: the assignment step is one big descriptor x codebook matmul
(MXU), the update step a segment-sum. The reference runs ONE k-means
iteration (bow.py:8); we default to more — strictly better codebooks for
the same asymptotic cost.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _assign(x: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """Nearest codeword per row of x. (N, D) x (K, D) -> (N,) int32."""
    # ||x - c||² = ||x||² - 2 x·c + ||c||²; ||x||² constant per row.
    dots = jnp.dot(x, codebook.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    c2 = jnp.sum(codebook * codebook, axis=-1)
    return jnp.argmin(c2[None, :] - 2.0 * dots, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(key: jax.Array, x: jnp.ndarray, k: int, iters: int = 10) -> jnp.ndarray:
    """Lloyd's k-means. x: (N, D) -> codebook (K, D).

    Init: random distinct samples. Empty clusters keep their previous
    centroid (standard fixed-shape fallback)."""
    n = x.shape[0]
    init_idx = jax.random.choice(key, n, (k,), replace=False)
    codebook0 = x[init_idx]

    def step(codebook, _):
        a = _assign(x, codebook)
        onehot_sums = jax.ops.segment_sum(x, a, num_segments=k)
        counts = jax.ops.segment_sum(jnp.ones((n,), x.dtype), a, num_segments=k)
        new = onehot_sums / jnp.maximum(counts[:, None], 1.0)
        new = jnp.where(counts[:, None] > 0, new, codebook)
        return new, None

    codebook, _ = jax.lax.scan(step, codebook0, None, length=iters)
    return codebook


def vector_quantize(x: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """scipy.cluster.vq.vq analog (ref matching.py:27)."""
    return _assign(x, codebook)


def build_codebook(key: jax.Array, descriptors: jnp.ndarray, valid: jnp.ndarray, k: int = 200, iters: int = 10) -> jnp.ndarray:
    """Codebook from a (B, K, D) stacked descriptor tensor with validity
    masks (ref bow.py stacks all images' descriptors). Invalid rows are
    replaced by resampled valid rows so they can't capture centroids."""
    d = descriptors.reshape(-1, descriptors.shape[-1])
    v = valid.reshape(-1)
    n = d.shape[0]
    # Replace invalid rows with random valid rows (fixed-shape fill).
    p = v.astype(jnp.float32)
    p = p / jnp.sum(p)
    fill = jax.random.choice(key, n, (n,), p=p)
    d = jnp.where(v[:, None] > 0, d, d[fill])
    return kmeans(jax.random.fold_in(key, 1), d, k, iters)


@functools.partial(jax.jit, static_argnames=("k",))
def tfidf_vectors(words: jnp.ndarray, valid: jnp.ndarray, k: int) -> jnp.ndarray:
    """Per-image tf-idf vectors. words: (B, K) visual word ids, valid masks
    padded slots. Mirrors matching.py:30-48."""
    oh = jax.nn.one_hot(words, k, dtype=jnp.float32) * valid[..., None]
    tf = jnp.sum(oh, axis=1)  # (B, k) term frequencies
    df = jnp.sum(tf > 0, axis=0)  # (k,)
    n = tf.shape[0]
    idf = jnp.log(n / jnp.maximum(df, 1.0))
    return tf * idf[None, :]


@functools.partial(jax.jit, static_argnames=("top_k",))
def topk_similar(tfidf: jnp.ndarray, top_k: int = 10) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All-pairs cosine similarity + per-image top-k neighbors (excluding
    self). One (B, k)x(k, B) matmul replaces the reference's per-image
    python loop (matching.py:52-59). Returns (idx (B, top_k), sim)."""
    norm = jnp.maximum(jnp.linalg.norm(tfidf, axis=-1, keepdims=True), 1e-9)
    x = tfidf / norm
    sim = jnp.dot(x, x.T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    sim = sim - 2.0 * jnp.eye(sim.shape[0], dtype=sim.dtype)  # exclude self
    vals, idx = jax.lax.top_k(sim, min(top_k, sim.shape[0] - 1))
    return idx.astype(jnp.int32), vals
