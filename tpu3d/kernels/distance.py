"""Pallas TPU kernel: tiled descriptor similarity with fused top-2/argmax.

The mutual-NN matcher needs, for every query descriptor, the best and
second-best similarity against the other image plus the column-argmax for
the mutuality check. The jnp path (matching/mnn.py) materializes the full
(K0, K1) similarity matrix in HBM and re-reads it for every reduction; this
kernel streams K1 in 128-wide tiles through VMEM, computing each tile's
similarities on the MXU and folding them into running (best, second,
argmax) accumulators — the similarity matrix never exists in memory.

Grid: (K0 // BM, K1 // BN); accumulators live in VMEM scratch across the
inner (j) dimension; outputs are written on the last j step.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BM = 256   # query rows per tile
BN = 256   # key columns per tile


def _top2_kernel(d0_ref, d1_ref, best_ref, second_ref, arg_ref,
                 best_s, second_s, arg_s):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_s[:] = jnp.full_like(best_s, -2.0)
        second_s[:] = jnp.full_like(second_s, -2.0)
        arg_s[:] = jnp.zeros_like(arg_s)

    sim = jnp.dot(d0_ref[:], d1_ref[:].T, preferred_element_type=jnp.float32)  # (BM, BN)
    tile_best = jnp.max(sim, axis=1)
    tile_arg = jnp.argmax(sim, axis=1).astype(jnp.int32) + j * BN
    cols = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
    sim_wo = jnp.where(cols == (tile_arg - j * BN)[:, None], -2.0, sim)
    tile_second = jnp.max(sim_wo, axis=1)

    old_best = best_s[:, 0]
    old_second = second_s[:, 0]
    old_arg = arg_s[:, 0]
    new_best = jnp.maximum(old_best, tile_best)
    new_arg = jnp.where(tile_best > old_best, tile_arg, old_arg)
    # second best = max of the losers
    new_second = jnp.maximum(
        jnp.minimum(old_best, tile_best),
        jnp.maximum(old_second, tile_second),
    )
    best_s[:, 0] = new_best
    second_s[:, 0] = new_second
    arg_s[:, 0] = new_arg

    @pl.when(j == nj - 1)
    def _():
        best_ref[:, 0] = best_s[:, 0]
        second_ref[:, 0] = second_s[:, 0]
        arg_ref[:, 0] = arg_s[:, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def descriptor_top2(d0: jnp.ndarray, d1: jnp.ndarray, interpret: bool = False
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-row (best, second, argmax) of d0 @ d1ᵀ without materializing it.

    d0: (K0, D), d1: (K1, D); K0/K1 padded to multiples of 256, D to 128.
    """
    K0, D = d0.shape
    K1 = d1.shape[0]
    assert K0 % BM == 0 and K1 % BN == 0, "pad keypoint counts to 256"

    grid = (K0 // BM, K1 // BN)
    out_shape = (
        jax.ShapeDtypeStruct((K0, 1), jnp.float32),
        jax.ShapeDtypeStruct((K0, 1), jnp.float32),
        jax.ShapeDtypeStruct((K0, 1), jnp.int32),
    )
    best, second, arg = pl.pallas_call(
        _top2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BM, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((BM, 1), jnp.float32),
            pltpu.VMEM((BM, 1), jnp.float32),
            pltpu.VMEM((BM, 1), jnp.int32),
        ],
        interpret=interpret,
    )(d0, d1)
    return best[:, 0], second[:, 0], arg[:, 0]


def mutual_nn_pallas(d0, d1, valid0, valid1, ratio: float = 0.95, interpret: bool = False):
    """Drop-in MatchResult-compatible mutual-NN matcher built on the tiled
    top-2 kernel (both directions)."""
    from tpu3d.matching.mnn import MatchResult

    # Invalid rows must lose every comparison. Encode the mask INTO the
    # matmul: append a bias channel (queries carry 1, valid keys 0, invalid
    # keys -3) and zero-pad the feature dim to the 128 lane multiple, so
    # sim' = sim + bias and masked columns score -3 < any cosine.
    K0, D = d0.shape
    K1 = d1.shape[0]
    Dp = ((D + 1 + 127) // 128) * 128

    def aug(dq, dk, vq, vk):
        q = jnp.zeros((dq.shape[0], Dp), dq.dtype)
        q = q.at[:, :D].set(dq * (vq > 0)[:, None]).at[:, D].set(1.0)
        k = jnp.zeros((dk.shape[0], Dp), dk.dtype)
        k = k.at[:, :D].set(dk * (vk > 0)[:, None])
        k = k.at[:, D].set(jnp.where(vk > 0, 0.0, -3.0))
        return q, k

    q0, k1 = aug(d0, d1, valid0, valid1)
    q1, k0 = aug(d1, d0, valid1, valid0)
    best0, second0, arg0 = descriptor_top2(q0, k1, interpret=interpret)
    best1, _, arg1 = descriptor_top2(q1, k0, interpret=interpret)

    valid_pair = (valid0 > 0) & (valid1[arg0] > 0)
    dist1 = jnp.maximum(2.0 - 2.0 * best0, 0.0)
    dist2 = jnp.maximum(2.0 - 2.0 * second0, 0.0)
    ratio_ok = dist1 < (ratio * ratio) * dist2
    mutual = arg1[arg0] == jnp.arange(d0.shape[0])
    valid = valid_pair & mutual & ratio_ok
    return MatchResult(
        idx0=jnp.arange(d0.shape[0], dtype=jnp.int32),
        idx1=arg0.astype(jnp.int32),
        valid=valid,
        score=best0,
    )
