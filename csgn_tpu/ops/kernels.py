"""Pallas TPU kernels for the hot ops (word-major [W, C] layout).

Measured on one v5e chip (see docs/performance.md; HBM ~819 GB/s):

  * `mul_chunks_pallas` — chunk cross-product AND.  XLA's broadcast fusion
    re-reads both operands from HBM for every output tile (~3x traffic,
    229 GB/s effective).  This kernel holds an a-block and b-block in VMEM and
    streams pure output: **728 GB/s** write with blocks (W, 32, 512).
  * `decrypt_parity_pallas` — streaming eq-all + parity.  The XLA formulation
    in `ops.core.decrypt_parity` already runs at ~920 GB/s read (the VPU
    eq-all trick), so the Pallas version exists as an alternative/verification
    path and for fusion into larger pipelines, not as the default.

Both are bit-exact to the `csgn_tpu.ops.core` oracles (tests/test_kernels.py).
On non-TPU backends they run in interpreter mode so call sites work in CPU
tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mul_chunks_pallas", "decrypt_parity_pallas", "MUL_PALLAS_MIN_OUT"]

# Below this output size (chunks), dispatch overhead dominates and the XLA
# broadcast path is used instead (see ops.dispatch).
MUL_PALLAS_MIN_OUT = 1 << 14


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Multiply: chunk cross-product AND
# ---------------------------------------------------------------------------

# VMEM budget for the output block (double-buffered by the pipeline).
_MUL_VMEM_OUT_BUDGET = 5 << 20


def mul_pallas_supported(t1: int, t2: int, w: int) -> bool:
    """The flat kernel needs b VMEM-resident and a 128-aligned output block."""
    return t2 % 128 == 0 and t2 * w * 4 <= (8 << 20)


def _pick_bi(t2: int, w: int) -> int:
    # Output block is (W, BI*t2); keep it within budget, at most 4 (measured
    # fastest), and BI*t2 is automatically 128-aligned since t2 % 128 == 0.
    return max(1, min(4, _MUL_VMEM_OUT_BUDGET // (t2 * w * 4)))


@functools.partial(jax.jit, static_argnames=())
def mul_chunks_pallas(a: jax.Array, b: jax.Array) -> jax.Array:
    """Cross-product AND: [W,t1] x [W,t2] -> [W, t1*t2], out index i*t2+j.

    Writes the canonical flat word-major layout **directly**: each grid step
    holds BI a-columns (via a host-side [G, W, BI] regrouping of a — 640 KB
    relayout, amortized) plus all of b in VMEM, and stores BI contiguous
    (W, t2) output tiles.  An earlier 3-D formulation ([W, t1, t2] blocks) hit
    728 GB/s in-kernel but the [W,t1,t2]->[W,t1*t2] reshape forced a full
    relayout copy (net 227 GB/s); this design measures ~640 GB/s end to end
    vs 229 GB/s for XLA's broadcast fusion (docs/performance.md).

    Output chunk ordering i*t2+j matches reference src/Ciphertext.cpp:159.
    Requires `mul_pallas_supported(t1, t2, w)`; `ops.dispatch` guards this.
    """
    w, t1 = a.shape
    _, t2 = b.shape
    bi = _pick_bi(t2, w)
    t1p = _round_up(t1, bi)
    ap = jnp.pad(a, ((0, 0), (0, t1p - t1))) if t1p != t1 else a
    # Regroup a so the kernel can take BI columns with static slices only
    # (Mosaic has no dynamic lane slicing): [W, t1p] -> [t1p/BI, W, BI].
    ag = ap.reshape(w, t1p // bi, bi).transpose(1, 0, 2)

    def kern(a_ref, b_ref, o_ref):
        av = a_ref[0]                        # (W, BI)
        bv = b_ref[:]                        # (W, t2)
        for ii in range(bi):
            o_ref[:, ii * t2 : (ii + 1) * t2] = av[:, ii : ii + 1] & bv

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((w, t1p * t2), jnp.uint32),
        grid=(t1p // bi,),
        in_specs=[
            pl.BlockSpec((1, w, bi), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, t2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((w, bi * t2), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(ag, b)

    # Padded a-columns land at the tail (i >= t1) of the i-major layout.
    return out[:, : t1 * t2] if t1p != t1 else out


# ---------------------------------------------------------------------------
# Decrypt: streaming eq-all + parity accumulation
# ---------------------------------------------------------------------------


def _decrypt_kernel(words_ref, mask_ref, out_ref, acc_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        acc_ref[0] = 0

    m = mask_ref[:]                                       # (W, 1)
    blk = words_ref[:]                                    # (W, BC)
    matches = jnp.all((blk & m) == m, axis=0)             # (BC,) bool
    acc_ref[0] += jnp.sum(matches.astype(jnp.int32))

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        out_ref[0] = acc_ref[0] & 1


@functools.partial(jax.jit, static_argnames=("block_c",))
def decrypt_parity_pallas(words: jax.Array, mask: jax.Array, *, block_c: int = 4096) -> jax.Array:
    """Decrypt [W, chunks] with packed mask [W] -> parity bit (uint32 scalar).

    Single streaming pass: chunk blocks enter VMEM, per-chunk eq-all match
    bits accumulate into an SMEM counter, final step emits parity.  Zero-pad
    chunks never match (mask has at least one set bit since d >= 1).
    """
    w, chunks = words.shape
    bc = min(block_c, _round_up(max(chunks, 128), 128))
    cp = _round_up(chunks, bc)
    wp = jnp.pad(words, ((0, 0), (0, cp - chunks))) if cp != chunks else words

    out = pl.pallas_call(
        _decrypt_kernel,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        grid=(cp // bc,),
        in_specs=[
            pl.BlockSpec((w, bc), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=_interpret(),
    )(wp, mask.reshape(w, 1))

    return out[0].astype(jnp.uint32)
