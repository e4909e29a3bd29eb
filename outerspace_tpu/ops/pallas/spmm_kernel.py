"""Pallas block-ELL SpMM kernel: sparse weights × dense activations on MXU.

The reference ran pruned-NN layers through the simulated SpGEMM machine by
exporting activations and weights as .mtx pairs (``NN_models/
get_mtx_files.py``; ``./simulator act_i.mtx fcN_weight.mtx`` computes
``act·Wᵀ``). On a TPU the right primitive for *structured* NN sparsity is
a dense-block kernel: the weight matrix lives in padded block-ELL
(``formats/compact.py:BlockELL``) and each stored (bm × bn) block hits the
MXU against a (bn × tn) activation tile, skipping absent blocks entirely.

Grid: (row_blocks, activation_col_tiles, max_blocks_per_row); the last
axis is the reduction — the output tile stays resident in VMEM across it.
Block-column indices arrive by scalar prefetch and drive the activation
BlockSpec, so block gathering is pure DMA scheduling, not compute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from outerspace_tpu.formats.compact import BlockELL


def _spmm_kernel(
    meta_ref,  # SMEM int32[nrb * max_blocks, 3]: (eff block_col, mask,
    #            eff w-slot) — masked slots repeat a neighboring valid
    #            slot's indices so their grid steps issue NO new DMA
    w_ref,  # VMEM f32[1, 1, bm, bn]
    x_ref,  # VMEM f32[bn, tn]
    out_ref,  # VMEM f32[bm, tn]
    *,
    max_blocks: int,
):
    ib = pl.program_id(0)
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(meta_ref[ib * max_blocks + s, 1] != 0)
    def _acc():
        # HIGHEST precision: full-f32 MXU passes. The MXU's default
        # (bfloat16 operands) loses ~3 decimal digits, which would break
        # the 1e-6 parity bar vs the CPU reference (SimSpGEMM.cpp:283).
        out_ref[...] += jnp.dot(
            w_ref[0, 0],
            x_ref[...],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )


@functools.partial(jax.jit, static_argnames=("tn", "interpret"))
def spmm_blockell_device(
    meta: jax.Array,  # int32[nrb * max_blocks, 2] (block_col, valid)
    blocks: jax.Array,  # f32[nrb, max_blocks, bm, bn]
    x: jax.Array,  # f32[K_pad, N_pad] dense activations (bn | K_pad, tn | N_pad)
    *,
    tn: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Y = W @ X with W in block-ELL; returns f32[nrb*bm, N_pad]."""
    nrb, max_blocks, bm, bn = blocks.shape
    n_pad = x.shape[1]
    grid = (nrb, n_pad // tn, max_blocks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, bm, bn),
                lambda ib, jt, s, meta, mb=max_blocks: (
                    ib,
                    meta[ib * mb + s, 2],
                    0,
                    0,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bn, tn),
                lambda ib, jt, s, meta, mb=max_blocks: (
                    meta[ib * mb + s, 0],
                    jt,
                ),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (bm, tn),
            lambda ib, jt, s, meta: (ib, jt),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(_spmm_kernel, max_blocks=max_blocks),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrb * bm, n_pad), jnp.float32),
        interpret=interpret,
    )(meta, blocks, x)


def blockell_to_device(w: BlockELL) -> dict[str, jax.Array]:
    """Stage a BlockELL weight matrix for the kernel.

    Masked (padding) slots get *effective* fetch indices — the nearest
    previous valid slot's activation block-col and weight slot (leading
    pads take the first valid's) — so the Pallas pipeline sees an
    unchanged block index at masked grid steps and issues no DMA for
    them (they used to re-fetch block 0 every time; measurable waste on
    ragged ELL rows)."""
    bc = np.asarray(w.block_cols, dtype=np.int32)
    mask = np.asarray(w.block_mask, dtype=bool)
    nrb, mb = bc.shape
    slot = np.tile(np.arange(mb, dtype=np.int64), (nrb, 1))
    idx = np.where(mask, slot, -1)
    last = np.maximum.accumulate(idx, axis=1)  # -1 before any valid
    any_valid = mask.any(axis=1)
    first = np.where(any_valid, mask.argmax(axis=1), 0).astype(np.int64)
    src = np.where(last >= 0, last, first[:, None])  # [nrb, mb]
    bc_eff = np.take_along_axis(bc, src, axis=1)
    meta = np.stack(
        [
            bc_eff.reshape(-1).astype(np.int32),
            mask.reshape(-1).astype(np.int32),
            src.reshape(-1).astype(np.int32),
        ],
        axis=1,
    )
    return dict(
        meta=jnp.asarray(meta),
        blocks=jnp.asarray(w.blocks),
    )


def spmm(
    w: BlockELL,
    x: jax.Array | np.ndarray,
    *,
    tn: int = 128,
    interpret: bool = False,
    device_args: dict | None = None,
) -> jax.Array:
    """Y = W @ X for a block-ELL sparse W and dense X (f32[K, N]).

    Pads X to kernel alignment and crops the result to (M, N).
    """
    m, k = w.shape
    x = jnp.asarray(x, dtype=jnp.float32)
    if x.ndim != 2 or x.shape[0] != k:
        raise ValueError(f"X shape {x.shape} incompatible with W {w.shape}")
    bm, bn = w.block_shape
    n = x.shape[1]
    k_pad = w.blocks.shape[0] and -(-k // bn) * bn
    k_pad = max(k_pad, bn)
    n_pad = -(-n // tn) * tn
    x_p = jnp.zeros((k_pad, n_pad), jnp.float32).at[:k, :n].set(x)
    dev = device_args if device_args is not None else blockell_to_device(w)
    y = spmm_blockell_device(
        dev["meta"], dev["blocks"], x_p, tn=tn, interpret=interpret
    )
    return y[:m, :n]
