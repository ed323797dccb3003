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


def _mul_kernel(a_ref, b_ref, o_ref):
    # a: (W, BI, 1), b: (W, 1, BJ) -> o: (W, BI, BJ); pure VPU broadcast AND.
    o_ref[:] = a_ref[:] & b_ref[:]


@functools.partial(jax.jit, static_argnames=("block_i", "block_j"))
def mul_chunks_pallas(
    a: jax.Array, b: jax.Array, *, block_i: int = 32, block_j: int = 512
) -> jax.Array:
    """Cross-product AND: [W,t1] x [W,t2] -> [W, t1*t2], out index i*t2+j.

    The output is viewed 3-D as [W, t1, t2]; each grid step (i, j) writes one
    (W, BI, BJ) tile from a VMEM-resident a-column-block and b-column-block.
    Row-major flattening of (t1, t2) reproduces the reference's i*t2+j chunk
    ordering (reference src/Ciphertext.cpp:159).
    """
    w, t1 = a.shape
    _, t2 = b.shape
    bi = min(block_i, _round_up(t1, 8))
    bj = min(block_j, _round_up(t2, 128))

    t1p, t2p = _round_up(t1, bi), _round_up(t2, bj)
    ap = jnp.pad(a, ((0, 0), (0, t1p - t1))) if t1p != t1 else a
    bp = jnp.pad(b, ((0, 0), (0, t2p - t2))) if t2p != t2 else b

    out = pl.pallas_call(
        _mul_kernel,
        out_shape=jax.ShapeDtypeStruct((w, t1p, t2p), jnp.uint32),
        grid=(t1p // bi, t2p // bj),
        in_specs=[
            pl.BlockSpec((w, bi, 1), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, 1, bj), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((w, bi, bj), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(ap.reshape(w, t1p, 1), bp.reshape(w, 1, t2p))

    if (t1p, t2p) != (t1, t2):
        out = out[:, :t1, :t2]
    return out.reshape(w, t1 * t2)


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
