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

__all__ = [
    "mul_chunks_pallas",
    "mul_chunks_pallas_grouped",
    "mul_chunks_pallas_tiled",
    "mul_chunks_pallas_tiled_ragged",
    "mul_decrypt_pallas",
    "mul_decrypt_pallas_tiled",
    "mul_decrypt_pallas_tiled_ragged",
    "decrypt_parity_pallas",
    "fill_anchor_pallas",
    "MUL_PALLAS_MIN_OUT",
]

# Below this output size (chunks), dispatch overhead dominates and the XLA
# broadcast path is used instead (see ops.dispatch).
MUL_PALLAS_MIN_OUT = 1 << 14


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _out_struct(shape, dtype, *operands) -> jax.ShapeDtypeStruct:
    """Output aval whose varying-mesh-axes (vma) is the union of the
    operands' — required for pallas_call inside shard_map (check_vma=True);
    outside shard_map every vma is empty and this is a plain struct."""
    vma = frozenset()
    for o in operands:
        vma |= getattr(jax.typeof(o), "vma", frozenset())
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)


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
        out_shape=_out_struct((w, t1p * t2), jnp.uint32, ag, b),
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
# Fused multiply + decrypt: write the product AND accumulate its parity in
# the same pass — deletes the decrypt's full product re-read from HBM.
# ---------------------------------------------------------------------------

# The flagship pipeline (multiply then decrypt, reference Ciphertext.cpp:153-163
# followed by SecretKey.cpp:126-140) costs one product write + one product
# read when staged.  The fused kernels below emit the decrypt parity as a
# second (scalar) output of the multiply pass, so the pipeline's HBM traffic
# drops from 2x|product| to 1x.
#
# In-kernel the parity accumulation is strength-reduced: a product column
# (i, j) holds a_i & b_j, and
#   ((a_i & b_j) & m) == m   <=>   (a_i & m) == m  AND  (b_j & m) == m
# (every mask bit must be present in BOTH factors), so the block's match
# count is (matching a-columns) * (matching b-columns) — a few hundred VPU
# ops per grid step instead of 3 ops per output element.  This is bit-exactly
# `core.decrypt_parity(core.mul_chunks(a, b), mask)`; tests and the on-chip
# .tpuq sweep assert the equality against the staged oracle.


def _fused_acc_update(acc_ref, av, bv, m):
    """acc += (# a-columns matching m) * (# b-columns matching m)."""
    ma = jnp.all((av & m) == m, axis=0)                  # (t1_blk,) bool
    mb = jnp.all((bv & m) == m, axis=0)                  # (t2_blk,) bool
    acc_ref[0] += jnp.sum(ma.astype(jnp.int32)) * jnp.sum(mb.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("return_count",))
def mul_decrypt_pallas(
    a: jax.Array, b: jax.Array, mask: jax.Array, *, return_count: bool = False
):
    """Fused `mul_chunks_pallas` + decrypt: returns (prod [W, t1*t2], parity).

    Same blocking and output layout as `mul_chunks_pallas` (i-major flat
    writes, b VMEM-resident, BI a-columns per step); the per-step match-count
    product accumulates in SMEM and the final step emits the parity bit.
    Padded a-columns are all-zero and never match (mask has >= 1 set bit
    since d >= 1), so no pad correction is needed.
    Requires `mul_pallas_supported(t1, t2, w)`.

    ``return_count=True`` returns the raw int32 match count instead of the
    parity — the psum-able form the chunk-sharded fused multiply needs
    (each device's block count crosses the mesh before the final mod 2).
    """
    w, t1 = a.shape
    _, t2 = b.shape
    bi = _pick_bi(t2, w)
    t1p = _round_up(t1, bi)
    ap = jnp.pad(a, ((0, 0), (0, t1p - t1))) if t1p != t1 else a
    ag = ap.reshape(w, t1p // bi, bi).transpose(1, 0, 2)
    mask_c = mask.reshape(w, 1)

    def kern(a_ref, b_ref, m_ref, o_ref, p_ref, acc_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            acc_ref[0] = 0

        av = a_ref[0]                        # (W, BI)
        bv = b_ref[:]                        # (W, t2)
        for ii in range(bi):
            o_ref[:, ii * t2 : (ii + 1) * t2] = av[:, ii : ii + 1] & bv
        _fused_acc_update(acc_ref, av, bv, m_ref[:])

        @pl.when(step == pl.num_programs(0) - 1)
        def _():
            p_ref[0] = acc_ref[0]

    prod, parity = pl.pallas_call(
        kern,
        out_shape=[
            _out_struct((w, t1p * t2), jnp.uint32, ag, b),
            _out_struct((1,), jnp.int32, ag, b, mask_c),
        ],
        grid=(t1p // bi,),
        in_specs=[
            pl.BlockSpec((1, w, bi), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, t2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((w, bi * t2), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=_interpret(),
    )(ag, b, mask_c)

    if t1p != t1:
        prod = prod[:, : t1 * t2]
    if return_count:
        return prod, parity[0]
    return prod, (parity[0] & 1).astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("return_count",))
def mul_decrypt_pallas_tiled(
    a: jax.Array, b: jax.Array, mask: jax.Array, *, return_count: bool = False
):
    """Fused `mul_chunks_pallas_tiled` + decrypt (b streamed through VMEM).

    Grid (b-tiles, a-columns) with b-tile outermost, as in the unfused tiled
    kernel.  Each b-tile's match count is scaled by its a-column's match bit;
    every (j, i) pair is visited exactly once, so the SMEM accumulator sees
    each product column once.  Requires `mul_tiled_supported(t1, t2, w)`.
    ``return_count`` as in `mul_decrypt_pallas`.
    """
    w, t1 = a.shape
    _, t2 = b.shape
    bt = _pick_bt(t2, w)
    ag = a.T.reshape(t1, w, 1)
    mask_c = mask.reshape(w, 1)

    def kern(a_ref, b_ref, m_ref, o_ref, p_ref, acc_ref):
        j, i = pl.program_id(0), pl.program_id(1)

        @pl.when((j == 0) & (i == 0))
        def _():
            acc_ref[0] = 0

        o_ref[:] = a_ref[0] & b_ref[:]                      # (W,1) & (W,BT)
        _fused_acc_update(acc_ref, a_ref[0], b_ref[:], m_ref[:])

        @pl.when((j == pl.num_programs(0) - 1) & (i == pl.num_programs(1) - 1))
        def _():
            p_ref[0] = acc_ref[0]

    prod, parity = pl.pallas_call(
        kern,
        out_shape=[
            _out_struct((w, t1 * t2), jnp.uint32, ag, b),
            _out_struct((1,), jnp.int32, ag, b, mask_c),
        ],
        grid=(t2 // bt, t1),
        in_specs=[
            pl.BlockSpec((1, w, 1), lambda j, i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, bt), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, 1), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (w, bt), lambda j, i: (0, i * (t2 // bt) + j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=_interpret(),
    )(ag, b, mask_c)
    if return_count:
        return prod, parity[0]
    return prod, (parity[0] & 1).astype(jnp.uint32)


# ---------------------------------------------------------------------------
# Multiply variants: unaligned / small t2 (grouped) and huge t2 (b-tiled)
# ---------------------------------------------------------------------------

# The flat kernel above needs t2 % 128 == 0 because output tile `i` starts at
# lane i*t2 and Mosaic block columns must be lane-aligned.  The grouped kernel
# lifts that: it consumes GR a-columns per step (GR % 128 == 0, so both the
# a-block and the GR*t2-lane output block are lane-aligned) and assembles the
# output block in VMEM (unaligned concatenation is VPU shuffle work; fine for
# moderate t2, and the i-major order is usually better obtained lazily — see
# ops.order).  The tiled kernel lifts the b-fits-VMEM limit for 128-aligned
# t2 by streaming b tiles through VMEM.

_MUL_GROUP_MAX_PIECES = 256


def mul_grouped_supported(t1: int, t2: int, w: int) -> bool:
    """Grouped kernel: lane-aligned a-blocks (>=128 columns per step) need the
    minimum (W, 128*t2) output block to fit the VMEM budget."""
    return t2 >= 1 and 128 * t2 * w * 4 <= _MUL_VMEM_OUT_BUDGET


@functools.partial(jax.jit, static_argnames=("assembly",))
def mul_chunks_pallas_grouped(
    a: jax.Array, b: jax.Array, *, assembly: str = "concat"
) -> jax.Array:
    """Cross-product AND for arbitrary t2 (b VMEM-resident).

    [W,t1] x [W,t2] -> [W, t1*t2], out index i*t2+j (reference
    src/Ciphertext.cpp:159 ordering).  Each grid step consumes GR a-columns
    (GR % 128 == 0 so the a-block and the GR*t2-lane output block are both
    lane-aligned) and assembles the block in VMEM, either as one
    concatenation of GR pieces or as GR unaligned sub-stores (both
    Mosaic-supported; measured on chip to pick the default).  t2 == 1
    degenerates to a broadcast AND with large blocks (no assembly).
    """
    w, t1 = a.shape
    _, t2 = b.shape
    # a-blocks are kept lane-aligned (GR % 128 == 0) so a is consumed in
    # place — an earlier [W,t1] -> [steps,W,GR] regroup cost a full extra HBM
    # pass on large a (measured: dominated the kernel for chain t1 >> t2).
    if t2 == 1:
        # Pure lane-broadcast AND: no per-piece work, so use ~2 MB blocks.
        gr = min(_round_up(t1, 128), 128 * max(1, (2 << 20) // (128 * w * 4)))
    else:
        # Widen the block toward ~1 MB, keeping the piece count bounded.
        gr = 128 * max(
            1,
            min(
                _MUL_GROUP_MAX_PIECES // 128,
                (1 << 20) // max(128 * t2 * w * 4, 1),
            ),
        )
    t1p = _round_up(t1, gr)
    ap = jnp.pad(a, ((0, 0), (0, t1p - t1))) if t1p != t1 else a

    def kern(a_ref, b_ref, o_ref):
        av = a_ref[:]                                       # (W, GR)
        bv = b_ref[:]                                       # (W, t2)
        if t2 == 1:
            o_ref[:] = av & bv                              # lane broadcast
        elif assembly == "stores":
            for ii in range(gr):
                o_ref[:, ii * t2 : (ii + 1) * t2] = av[:, ii : ii + 1] & bv
        else:
            pieces = [av[:, ii : ii + 1] & bv for ii in range(gr)]
            o_ref[:] = jnp.concatenate(pieces, axis=1)

    out = pl.pallas_call(
        kern,
        out_shape=_out_struct((w, t1p * t2), jnp.uint32, ap, b),
        grid=(t1p // gr,),
        in_specs=[
            pl.BlockSpec((w, gr), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, t2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((w, gr * t2), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(ap, b)

    return out[:, : t1 * t2] if t1p != t1 else out


def _pick_bt(t2: int, w: int) -> int:
    """Largest 128-multiple divisor of t2 with a <=2 MB (W, BT) tile."""
    cap = max((2 << 20) // (w * 4), 128)
    best = 0
    bt = 128
    while bt <= min(t2, cap):
        if t2 % bt == 0:
            best = bt
        bt += 128
    return best


def mul_tiled_supported(t1: int, t2: int, w: int) -> bool:
    return t2 % 128 == 0 and _pick_bt(t2, w) > 0


@functools.partial(jax.jit, static_argnames=())
def mul_chunks_pallas_tiled(a: jax.Array, b: jax.Array) -> jax.Array:
    """Cross-product AND with b streamed through VMEM (t2 % 128 == 0, any size).

    [W,t1] x [W,t2] -> [W, t1*t2], out index i*t2+j.  Grid is (b-tiles,
    a-columns) with b-tile outermost so each of the t2/BT b tiles is fetched
    once and swept across all t1 a-columns; per-step output block is (W, BT)
    at lane offset i*t2 + j*BT.  Output traffic dominates (a and b are each
    read ~once), so this sustains near write speed-of-light even when b
    exceeds the flat kernel's 8 MB VMEM budget.
    """
    w, t1 = a.shape
    _, t2 = b.shape
    bt = _pick_bt(t2, w)
    ag = a.T.reshape(t1, w, 1)

    def kern(a_ref, b_ref, o_ref):
        o_ref[:] = a_ref[0] & b_ref[:]                      # (W,1) & (W,BT)

    return pl.pallas_call(
        kern,
        out_shape=_out_struct((w, t1 * t2), jnp.uint32, ag, b),
        grid=(t2 // bt, t1),
        in_specs=[
            pl.BlockSpec((1, w, 1), lambda j, i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, bt), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (w, bt), lambda j, i: (0, i * (t2 // bt) + j), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(ag, b)


# ---------------------------------------------------------------------------
# Multiply: ragged-tiled — stream an *unaligned* operand, zero-padding it to
# lane alignment inside the kernel (pad chunks are parity-neutral; the caller
# records them in the order tag — see ops/order.py)
# ---------------------------------------------------------------------------


def ragged_bt(t: int) -> int:
    """Streamed-operand block size: power of two in [1024, 8192], at most
    ~t/16 so the alignment waste (< one block) stays under ~6%."""
    return min(8192, max(1024, 1 << max(0, t.bit_length() - 5)))


def ragged_padded(t: int) -> int:
    """Padded streamed-operand length the ragged kernel will produce."""
    return _round_up(t, ragged_bt(t))


RAGGED_MIN_T = 1 << 14


def mul_ragged_supported(t: int) -> bool:
    """Streamed operand must be large enough to amortize the pad waste."""
    return t >= RAGGED_MIN_T


@functools.partial(jax.jit, static_argnames=())
def mul_chunks_pallas_tiled_ragged(a: jax.Array, b: jax.Array) -> jax.Array:
    """Cross-product AND streaming an unaligned b: [W,t1] x [W,t2] ->
    [W, t1*t2p] with t2p = ragged_padded(t2).

    Same structure as `mul_chunks_pallas_tiled` (b-tile outermost, output
    block (W, BT) per step) but t2 need not be 128-aligned: each i-block of
    the output holds b's t2 chunks followed by t2p-t2 all-zero pad chunks.
    The final (partial) b tile is masked to zero in-kernel, so no HBM-side
    copy of either operand is ever made — the pad costs only its share of
    output writes, bounded by ragged_bt (< ~6% of the product).  Pad chunks
    are parity-neutral under decrypt and absorbing under multiply; the caller
    marks them PAD in the order tag (ops/order.py).
    """
    w, t1 = a.shape
    _, t2 = b.shape
    bt = ragged_bt(t2)
    t2p = _round_up(t2, bt)
    ag = a.T.reshape(t1, w, 1)
    last = t2 // bt                                         # ragged tile index

    def kern(a_ref, b_ref, o_ref):
        j = pl.program_id(0)
        o_ref[:] = a_ref[0] & b_ref[:]                      # (W,1) & (W,BT)
        if t2 % bt:
            # Boundary tile: lanes at or beyond t2 read unspecified padding
            # from the clamped DMA — force them to zero (pad chunks MUST be
            # exactly zero to stay parity-neutral).
            @pl.when(j == last)
            def _():
                lanes = jax.lax.broadcasted_iota(jnp.int32, (w, bt), 1)
                valid = (j * bt + lanes) < t2
                o_ref[:] = jnp.where(valid, a_ref[0] & b_ref[:], jnp.uint32(0))

    return pl.pallas_call(
        kern,
        out_shape=_out_struct((w, t1 * t2p), jnp.uint32, ag, b),
        grid=(t2p // bt, t1),
        in_specs=[
            pl.BlockSpec((1, w, 1), lambda j, i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, bt), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (w, bt), lambda j, i: (0, i * (t2p // bt) + j), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(ag, b)


@functools.partial(jax.jit, static_argnames=("return_count",))
def mul_decrypt_pallas_tiled_ragged(
    a: jax.Array, b: jax.Array, mask: jax.Array, *, return_count: bool = False
):
    """Fused `mul_chunks_pallas_tiled_ragged` + decrypt: returns
    (prod [W, t1*t2p] with t2p = ragged_padded(t2), parity).

    Same blocking as the unfused ragged kernel (b-tile outermost, (W, BT)
    output blocks, boundary tile zero-masked).  The per-step match count is
    the a-column's match bit times the tile's VALID matching b-lanes — pad
    lanes are excluded by the same `j*BT + lane < t2` predicate that zeroes
    them in the output, so garbage read past b's end by the clamped DMA can
    never contribute.  Bit-exact to `core.decrypt_parity` over the padded
    product (pad chunks are all-zero and parity-neutral since d >= 1); covers
    the unaligned band of the flagship multiply-then-decrypt pipeline
    (reference src/Ciphertext.cpp:153-163 -> src/SecretKey.cpp:104-147) that
    the flat/tiled fused kernels cannot (they need t2 % 128 == 0).
    ``return_count`` as in `mul_decrypt_pallas`.
    """
    w, t1 = a.shape
    _, t2 = b.shape
    bt = ragged_bt(t2)
    t2p = _round_up(t2, bt)
    ag = a.T.reshape(t1, w, 1)
    mask_c = mask.reshape(w, 1)
    last = t2 // bt                                         # ragged tile index

    def kern(a_ref, b_ref, m_ref, o_ref, p_ref, acc_ref):
        j, i = pl.program_id(0), pl.program_id(1)

        @pl.when((j == 0) & (i == 0))
        def _():
            acc_ref[0] = 0

        av = a_ref[0]                                       # (W, 1)
        bv = b_ref[:]                                       # (W, BT)
        m = m_ref[:]
        o_ref[:] = av & bv
        ma = jnp.all((av & m) == m)                         # scalar bool
        mb = jnp.all((bv & m) == m, axis=0, keepdims=True)  # (1, BT)
        if t2 % bt:
            @pl.when(j == last)
            def _():
                lanes = jax.lax.broadcasted_iota(jnp.int32, (w, bt), 1)
                valid = (j * bt + lanes) < t2
                o_ref[:] = jnp.where(valid, av & bv, jnp.uint32(0))

            # Pad lanes must not count: beyond b's end the clamped DMA reads
            # unspecified bytes that could spuriously match the mask.
            lanes1 = jax.lax.broadcasted_iota(jnp.int32, (1, bt), 1)
            mb = mb & ((j * bt + lanes1) < t2)
        acc_ref[0] += ma.astype(jnp.int32) * jnp.sum(mb.astype(jnp.int32))

        @pl.when((j == pl.num_programs(0) - 1) & (i == pl.num_programs(1) - 1))
        def _():
            p_ref[0] = acc_ref[0]

    prod, parity = pl.pallas_call(
        kern,
        out_shape=[
            _out_struct((w, t1 * t2p), jnp.uint32, ag, b),
            _out_struct((1,), jnp.int32, ag, b, mask_c),
        ],
        grid=(t2p // bt, t1),
        in_specs=[
            pl.BlockSpec((1, w, 1), lambda j, i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, bt), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, 1), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (w, bt), lambda j, i: (0, i * (t2p // bt) + j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=_interpret(),
    )(ag, b, mask_c)
    if return_count:
        return prod, parity[0]
    return prod, (parity[0] & 1).astype(jnp.uint32)


# ---------------------------------------------------------------------------
# Write-speed-of-light anchor: a fill at the flat mul kernel's exact blocking
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("t1", "t2", "w"))
def fill_anchor_pallas(seed: jax.Array, t1: int, t2: int, w: int) -> jax.Array:
    """Write-only Pallas fill with `mul_chunks_pallas`'s blocking: out
    [W, t1p*t2] in (W, BI*t2) blocks over a t1p/BI grid.

    The bench's drift anchor (docs/performance.md "Measurement methodology"
    items 4-6): raw-XLA fills get fused into their consumer slice, and
    cross-job anchors ride hour drift, so every bench run measures THIS
    kernel inside the same interleaved groups as the production kernels and
    reports rates relative to it.  `seed` is a (1,) uint32 the fill
    broadcasts — a traced input so the jit cannot constant-fold.
    """
    bi = _pick_bi(t2, w)
    t1p = _round_up(t1, bi)

    def kern(s_ref, o_ref):
        o_ref[:] = jnp.full((w, bi * t2), s_ref[0], jnp.uint32)

    return pl.pallas_call(
        kern,
        out_shape=_out_struct((w, t1p * t2), jnp.uint32, seed),
        grid=(t1p // bi,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((w, bi * t2), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(seed)


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
        out_shape=_out_struct((1,), jnp.int32, wp, mask),
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
