"""Backend/size-aware op dispatch: Pallas kernels where they win, XLA where it
is already at speed-of-light (measurements in docs/performance.md)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from csgn_tpu.ops import core, kernels
from csgn_tpu.utils.metrics import op_metrics

__all__ = [
    "mul_chunks",
    "mul_chunks_auto",
    "mul_chunks_batched",
    "mul_chunks_jmajor",
    "mul_decrypt",
    "mul_decrypt_auto",
    "mul_decrypt_batched",
    "mul_decrypt_batched_auto",
    "mul_decrypt_count",
    "decrypt_parity",
]


def _path(name: str) -> None:
    """Record which kernel served this shape (once per compilation when
    called under a trace — see utils.metrics docstring)."""
    op_metrics().count(f"dispatch.{name}")

# XLA j-major concat serves the unaligned band only when BOTH operands are
# too small for the ragged kernel (t1 < 2^14); measured crossover vs grouped
# between t2=16 and t2=48 (docs/performance.md).
_JMAJOR_XLA_MAX_T2 = 32
# Grouped kernel beats XLA's canonical broadcast+reshape from ~8 b-chunks up.
_GROUPED_MIN_T2 = 8


@functools.cache
def _jit_core_mul():
    return jax.jit(core.mul_chunks)


@functools.cache
def _jit_core_decrypt():
    return jax.jit(core.decrypt_parity)


@functools.cache
def _jit_jmajor_xla():
    @jax.jit
    def jm(a, b):
        t2 = b.shape[-1]
        return jnp.concatenate([a & b[..., :, j : j + 1] for j in range(t2)], axis=-1)

    return jm


def mul_chunks_jmajor(a: jax.Array, b: jax.Array) -> jax.Array:
    """[W,t1] x [W,t2] -> [W, t1*t2] in **j-major** physical order
    (column p = j*t1 + i holds a_i & b_j).

    The j-major product is a concatenation of lane-aligned elementwise ANDs,
    so it avoids the lane-interleave that makes the canonical i-major order
    3-6x slower for small/unaligned t2 (measured; docs/performance.md).
    Equivalently it is the canonical product with the operands swapped, which
    lets the aligned Pallas kernels serve shapes they could not canonically.
    """
    w, t1 = a.shape[-2], a.shape[-1]
    t2 = b.shape[-1]
    if jax.default_backend() == "tpu" and a.ndim == 2:
        if kernels.mul_pallas_supported(t2, t1, w):
            _path("mul.jm_flat")
            return kernels.mul_chunks_pallas(b, a)
        if kernels.mul_tiled_supported(t2, t1, w):
            _path("mul.jm_tiled")
            return kernels.mul_chunks_pallas_tiled(b, a)
    _path("mul.jm_xla")
    return _jit_jmajor_xla()(a, b)


def mul_chunks(a: jax.Array, b: jax.Array) -> jax.Array:
    """[W,t1] x [W,t2] -> [W,t1*t2] in canonical i-major order.

    Pallas on TPU for large outputs (pure output streaming, ~3x less HBM
    traffic than XLA's broadcast fusion); XLA otherwise (small ops are
    dispatch-bound, and XLA's fused form wins whenever the product feeds a
    reduction instead of being materialized)."""
    t1, t2 = a.shape[-1], b.shape[-1]
    if (
        jax.default_backend() == "tpu"
        and a.ndim == 2
        and t1 * t2 >= kernels.MUL_PALLAS_MIN_OUT
    ):
        w = a.shape[0]
        if kernels.mul_pallas_supported(t1, t2, w):
            _path("mul.flat")
            return kernels.mul_chunks_pallas(a, b)
        if kernels.mul_tiled_supported(t1, t2, w):
            _path("mul.tiled")
            return kernels.mul_chunks_pallas_tiled(a, b)
        if t2 >= _GROUPED_MIN_T2 and kernels.mul_grouped_supported(t1, t2, w):
            _path("mul.grouped")
            return kernels.mul_chunks_pallas_grouped(a, b)
    _path("mul.xla")
    return _jit_core_mul()(a, b)


@functools.cache
def _jit_staged_mul_decrypt(variant: str, count: bool):
    """ONE-dispatch staged product+parity for shapes with no fused kernel.

    The product kernel still runs at its `mul_chunks_auto` rate; the decrypt
    re-read costs one extra product pass, but the whole pipeline stays a
    single jit (single ~27 ms tunnel dispatch), so `mul_and_decrypt` is never
    slower than separate `mul` + `decrypt` calls at ANY shape.  Works on 2-D
    ([W, t]) and batched 3-D ([B, W, t]) operands alike (`core` ops
    broadcast; `decrypt_parity` reduces the trailing two axes).
    """
    if variant == "jm_xla":
        def prod_fn(a, b):
            t2 = b.shape[-1]
            return jnp.concatenate(
                [a & b[..., :, j : j + 1] for j in range(t2)], axis=-1
            )
    elif variant == "grouped":
        prod_fn = kernels.mul_chunks_pallas_grouped
    else:
        prod_fn = core.mul_chunks

    @jax.jit
    def md(a, b, mask):
        prod = prod_fn(a, b)
        if count:
            return prod, jnp.sum(core.chunk_matches(prod, mask), dtype=jnp.int32)
        return prod, core.decrypt_parity(prod, mask)

    return md


def _mul_decrypt_route(a: jax.Array, b: jax.Array, mask: jax.Array, *, count: bool):
    """Fused multiply+decrypt over the FULL `mul_chunks_auto` shape envelope:
    returns ``(words, jmajor, zpad_a, zpad_b, val)``.

    Routing mirrors `mul_chunks_auto` exactly — the decrypt parity is a
    reduction over the *multiset* of product chunks (reference
    src/SecretKey.cpp:126-140), so it is chunk-order-independent (swapped
    j-major kernels need no correction) and pad-neutral (all-zero pad chunks
    never match a mask with d >= 1), which lets every product kernel family
    carry the fused SMEM accumulator unchanged.  Shapes with no fused kernel
    (mid-size unaligned t2) run their best product kernel + decrypt staged
    under ONE jit.  ``val`` is the parity bit, or the raw psum-able int32
    match count with ``count=True``.
    """
    t1, t2 = a.shape[-1], b.shape[-1]
    if (
        jax.default_backend() == "tpu"
        and a.ndim == 2
        and t1 * t2 >= kernels.MUL_PALLAS_MIN_OUT
    ):
        w = a.shape[0]
        if kernels.mul_pallas_supported(t1, t2, w):
            _path("mul_dec.flat")
            out, v = kernels.mul_decrypt_pallas(a, b, mask, return_count=count)
            return out, False, 0, 0, v
        if kernels.mul_tiled_supported(t1, t2, w):
            _path("mul_dec.tiled")
            out, v = kernels.mul_decrypt_pallas_tiled(a, b, mask, return_count=count)
            return out, False, 0, 0, v
        if kernels.mul_pallas_supported(t2, t1, w):
            _path("mul_dec.jm_flat")
            out, v = kernels.mul_decrypt_pallas(b, a, mask, return_count=count)
            return out, True, 0, 0, v
        if kernels.mul_tiled_supported(t2, t1, w):
            _path("mul_dec.jm_tiled")
            out, v = kernels.mul_decrypt_pallas_tiled(b, a, mask, return_count=count)
            return out, True, 0, 0, v
        if kernels.mul_ragged_supported(t2) and t2 >= t1:
            _path("mul_dec.ragged")
            zp = kernels.ragged_padded(t2) - t2
            out, v = kernels.mul_decrypt_pallas_tiled_ragged(
                a, b, mask, return_count=count
            )
            return out, False, 0, zp, v
        if kernels.mul_ragged_supported(t1):
            _path("mul_dec.jm_ragged")
            zp = kernels.ragged_padded(t1) - t1
            out, v = kernels.mul_decrypt_pallas_tiled_ragged(
                b, a, mask, return_count=count
            )
            return out, True, zp, 0, v
        if 1 < t2 <= _JMAJOR_XLA_MAX_T2:
            _path("mul_dec.jm_xla")
            out, v = _jit_staged_mul_decrypt("jm_xla", count)(a, b, mask)
            return out, True, 0, 0, v
        if t2 >= _GROUPED_MIN_T2 and kernels.mul_grouped_supported(t1, t2, w):
            _path("mul_dec.grouped")
            out, v = _jit_staged_mul_decrypt("grouped", count)(a, b, mask)
            return out, False, 0, 0, v
    _path("mul_dec.xla")
    out, v = _jit_staged_mul_decrypt("xla", count)(a, b, mask)
    return out, False, 0, 0, v


def mul_decrypt_auto(a: jax.Array, b: jax.Array, mask: jax.Array):
    """Fastest fused multiply+decrypt, in whatever product layout the TPU
    likes: ``(words, jmajor, zpad_a, zpad_b, parity)`` — the fused analogue
    of `mul_chunks_auto` (same routing, same order/pad reporting for the
    caller's tag; see `_mul_decrypt_route`)."""
    return _mul_decrypt_route(a, b, mask, count=False)


def mul_decrypt(a: jax.Array, b: jax.Array, mask: jax.Array):
    """Fused multiply + decrypt: ``(prod [W, t1*t2] i-major, parity bit)``.

    The flagship pipeline op in its CANONICAL-layout form (callers that must
    not carry an order tag — chain folds, sharded blocks): on TPU the Pallas
    kernels accumulate the product's decrypt parity in SMEM during the same
    pass that writes the product, deleting the decrypt's full product read
    (mul+dec HBM traffic drops 2x -> 1x; docs/performance.md).  Unaligned
    shapes run the grouped product kernel + decrypt staged under one jit.
    Use `mul_decrypt_auto` when the caller tracks order tags — it serves
    every shape class fused.
    Bit-exact to `core.decrypt_parity(core.mul_chunks(a, b), mask)`.
    """
    t1, t2 = a.shape[-1], b.shape[-1]
    if (
        jax.default_backend() == "tpu"
        and a.ndim == 2
        and t1 * t2 >= kernels.MUL_PALLAS_MIN_OUT
    ):
        w = a.shape[0]
        if kernels.mul_pallas_supported(t1, t2, w):
            _path("mul_dec.flat")
            return kernels.mul_decrypt_pallas(a, b, mask)
        if kernels.mul_tiled_supported(t1, t2, w):
            _path("mul_dec.tiled")
            return kernels.mul_decrypt_pallas_tiled(a, b, mask)
        if t2 >= _GROUPED_MIN_T2 and kernels.mul_grouped_supported(t1, t2, w):
            _path("mul_dec.grouped")
            return _jit_staged_mul_decrypt("grouped", False)(a, b, mask)
    _path("mul_dec.xla")
    return _jit_staged_mul_decrypt("xla", False)(a, b, mask)


def mul_decrypt_count(a: jax.Array, b: jax.Array, mask: jax.Array):
    """`mul_decrypt` but returning the raw int32 match count — the psum-able
    form the chunk-sharded fused multiply needs (parallel/ops.py
    `sharded_mul_decrypt`: per-device block counts cross the mesh, then
    mod 2).  Canonical i-major output (sharded products are born i-major
    sharded); unaligned shapes stage grouped-product + count under one jit."""
    t1, t2 = a.shape[-1], b.shape[-1]
    if (
        jax.default_backend() == "tpu"
        and a.ndim == 2
        and t1 * t2 >= kernels.MUL_PALLAS_MIN_OUT
    ):
        w = a.shape[0]
        if kernels.mul_pallas_supported(t1, t2, w):
            _path("mul_dec.flat")
            return kernels.mul_decrypt_pallas(a, b, mask, return_count=True)
        if kernels.mul_tiled_supported(t1, t2, w):
            _path("mul_dec.tiled")
            return kernels.mul_decrypt_pallas_tiled(a, b, mask, return_count=True)
        if t2 >= _GROUPED_MIN_T2 and kernels.mul_grouped_supported(t1, t2, w):
            _path("mul_dec.grouped")
            return _jit_staged_mul_decrypt("grouped", True)(a, b, mask)
    _path("mul_dec.xla")
    return _jit_staged_mul_decrypt("xla", True)(a, b, mask)


def mul_chunks_auto(a: jax.Array, b: jax.Array) -> tuple[jax.Array, bool, int, int]:
    """Fastest materialized product, in whatever layout the TPU likes:
    returns ``(words, jmajor, zpad_a, zpad_b)``.

    ``zpad_a``/``zpad_b`` report all-zero chunks the ragged kernel appended
    to that operand for lane alignment (parity-neutral; the caller records
    them as PAD in the order tag — ops/order.py).  The output then has
    ``(t1+zpad_a) * (t2+zpad_b)`` physical chunks.

    Policy (single-chip v5e measurements, docs/performance.md): canonical
    Pallas kernels when the shape is lane-aligned (no tag overhead); swapped
    Pallas kernels (j-major) when the other operand is aligned; the ragged
    kernel (which zero-pads its streamed operand in-kernel) when either
    operand is large, covering every unaligned shape at tiled-kernel rates;
    XLA j-major concatenation and the grouped canonical kernel for the
    mid-size unaligned shapes; XLA's canonical form for the rest."""
    t1, t2 = a.shape[-1], b.shape[-1]
    if (
        jax.default_backend() == "tpu"
        and a.ndim == 2
        and t1 * t2 >= kernels.MUL_PALLAS_MIN_OUT
    ):
        w = a.shape[0]
        if kernels.mul_pallas_supported(t1, t2, w):
            _path("mul.flat")
            return kernels.mul_chunks_pallas(a, b), False, 0, 0
        if kernels.mul_tiled_supported(t1, t2, w):
            _path("mul.tiled")
            return kernels.mul_chunks_pallas_tiled(a, b), False, 0, 0
        if kernels.mul_pallas_supported(t2, t1, w):
            _path("mul.jm_flat")
            return kernels.mul_chunks_pallas(b, a), True, 0, 0
        if kernels.mul_tiled_supported(t2, t1, w):
            _path("mul.jm_tiled")
            return kernels.mul_chunks_pallas_tiled(b, a), True, 0, 0
        # Ragged kernel: stream the larger operand, zero-padded in-kernel.
        # For 5 <= t2 <= 32 the XLA j-major concat already runs at comparable
        # rates with no pad growth, so the ragged path only takes t2 outside
        # that band (measured crossovers: docs/performance.md).
        if kernels.mul_ragged_supported(t2) and t2 >= t1:
            _path("mul.ragged")
            zp = kernels.ragged_padded(t2) - t2
            return kernels.mul_chunks_pallas_tiled_ragged(a, b), False, 0, zp
        if kernels.mul_ragged_supported(t1):
            # Streamed-a j-major serves the ENTIRE unaligned band once the
            # accumulator is large: 268-567 GB/s for t2=1..16 at t1~2^20 vs
            # 25-127 GB/s for the XLA j-major concat and 225 GB/s for XLA's
            # t2=1 broadcast (chained-dispatch measurement, .tpuq/r2_job3).
            _path("mul.jm_ragged")
            zp = kernels.ragged_padded(t1) - t1
            return kernels.mul_chunks_pallas_tiled_ragged(b, a), True, zp, 0
        if 1 < t2 <= _JMAJOR_XLA_MAX_T2:
            _path("mul.jm_xla")
            return _jit_jmajor_xla()(a, b), True, 0, 0
        if t2 >= _GROUPED_MIN_T2 and kernels.mul_grouped_supported(t1, t2, w):
            _path("mul.grouped")
            return kernels.mul_chunks_pallas_grouped(a, b), False, 0, 0
    _path("mul.xla")
    return _jit_core_mul()(a, b), False, 0, 0


def mul_decrypt_batched_auto(a: jax.Array, b: jax.Array, mask: jax.Array):
    """Batched fused multiply+decrypt over the full shape envelope:
    [B,W,t1] x [B,W,t2] -> ``(words [B,W,phys], jmajor, zpad_a, zpad_b,
    bits uint32[B])`` — the fused analogue of `mul_chunks_batched` (same
    routing; the single-ciphertext fused kernels vectorize with `jax.vmap`,
    which prepends a batch grid dimension and leaves per-step VMEM blocks
    unchanged).  Element i of the output is the cross product of the
    operands' elements i plus ITS decrypt parity, all elements sharing one
    physical chunk order."""
    t1, t2 = a.shape[-1], b.shape[-1]
    batch = a.shape[0]
    if (
        jax.default_backend() == "tpu"
        and a.ndim == 3
        and batch * t1 * t2 >= kernels.MUL_PALLAS_MIN_OUT
    ):
        w = a.shape[-2]
        if kernels.mul_pallas_supported(t1, t2, w):
            _path("mul_dec.b_flat")
            out, bits = jax.vmap(lambda x, y: kernels.mul_decrypt_pallas(x, y, mask))(a, b)
            return out, False, 0, 0, bits
        if kernels.mul_tiled_supported(t1, t2, w):
            _path("mul_dec.b_tiled")
            out, bits = jax.vmap(
                lambda x, y: kernels.mul_decrypt_pallas_tiled(x, y, mask)
            )(a, b)
            return out, False, 0, 0, bits
        if kernels.mul_pallas_supported(t2, t1, w):
            _path("mul_dec.b_jm_flat")
            out, bits = jax.vmap(lambda x, y: kernels.mul_decrypt_pallas(y, x, mask))(a, b)
            return out, True, 0, 0, bits
        if kernels.mul_tiled_supported(t2, t1, w):
            _path("mul_dec.b_jm_tiled")
            out, bits = jax.vmap(
                lambda x, y: kernels.mul_decrypt_pallas_tiled(y, x, mask)
            )(a, b)
            return out, True, 0, 0, bits
        if kernels.mul_ragged_supported(t2) and t2 >= t1:
            _path("mul_dec.b_ragged")
            zp = kernels.ragged_padded(t2) - t2
            out, bits = jax.vmap(
                lambda x, y: kernels.mul_decrypt_pallas_tiled_ragged(x, y, mask)
            )(a, b)
            return out, False, 0, zp, bits
        if kernels.mul_ragged_supported(t1):
            _path("mul_dec.b_jm_ragged")
            zp = kernels.ragged_padded(t1) - t1
            out, bits = jax.vmap(
                lambda x, y: kernels.mul_decrypt_pallas_tiled_ragged(y, x, mask)
            )(a, b)
            return out, True, zp, 0, bits
        if 1 < t2 <= _JMAJOR_XLA_MAX_T2:
            _path("mul_dec.b_jm_xla")
            out, bits = _jit_staged_mul_decrypt("jm_xla", False)(a, b, mask)
            return out, True, 0, 0, bits
    _path("mul_dec.b_xla")
    out, bits = _jit_staged_mul_decrypt("xla", False)(a, b, mask)
    return out, False, 0, 0, bits


def mul_decrypt_batched(a: jax.Array, b: jax.Array, mask: jax.Array):
    """Batched fused multiply+decrypt in CANONICAL layout: [B,W,t1] x
    [B,W,t2] -> ([B,W,t1*t2] i-major, parity uint32[B]).  Callers that track
    order tags should use `mul_decrypt_batched_auto`, which serves every
    shape class fused."""
    t1, t2 = a.shape[-1], b.shape[-1]
    batch = a.shape[0]
    if (
        jax.default_backend() == "tpu"
        and a.ndim == 3
        and batch * t1 * t2 >= kernels.MUL_PALLAS_MIN_OUT
    ):
        w = a.shape[-2]
        if kernels.mul_pallas_supported(t1, t2, w):
            _path("mul_dec.b_flat")
            return jax.vmap(lambda x, y: kernels.mul_decrypt_pallas(x, y, mask))(a, b)
        if kernels.mul_tiled_supported(t1, t2, w):
            _path("mul_dec.b_tiled")
            return jax.vmap(lambda x, y: kernels.mul_decrypt_pallas_tiled(x, y, mask))(a, b)
    _path("mul_dec.b_xla")
    return _jit_staged_mul_decrypt("xla", False)(a, b, mask)


def mul_chunks_batched(a: jax.Array, b: jax.Array) -> tuple[jax.Array, bool, int, int]:
    """Batched `mul_chunks_auto`: [B,W,t1] x [B,W,t2] -> ([B,W,phys], jmajor,
    zpad_a, zpad_b) — element i of the output is the cross product of the
    operands' elements i, all elements sharing one physical chunk order.

    The single-ciphertext Pallas kernels vectorize with `jax.vmap` (Pallas
    prepends a batch grid dimension; per-step VMEM blocks are unchanged, so
    eligibility is the per-element check).  The output-size threshold uses
    the whole batch: dispatch overhead amortizes over B.
    """
    t1, t2 = a.shape[-1], b.shape[-1]
    batch = a.shape[0]
    if (
        jax.default_backend() == "tpu"
        and a.ndim == 3
        and batch * t1 * t2 >= kernels.MUL_PALLAS_MIN_OUT
    ):
        w = a.shape[-2]
        if kernels.mul_pallas_supported(t1, t2, w):
            _path("mul.b_flat")
            return jax.vmap(kernels.mul_chunks_pallas)(a, b), False, 0, 0
        if kernels.mul_tiled_supported(t1, t2, w):
            _path("mul.b_tiled")
            return jax.vmap(kernels.mul_chunks_pallas_tiled)(a, b), False, 0, 0
        if kernels.mul_pallas_supported(t2, t1, w):
            _path("mul.b_jm_flat")
            return jax.vmap(kernels.mul_chunks_pallas)(b, a), True, 0, 0
        if kernels.mul_tiled_supported(t2, t1, w):
            _path("mul.b_jm_tiled")
            return jax.vmap(kernels.mul_chunks_pallas_tiled)(b, a), True, 0, 0
        if kernels.mul_ragged_supported(t2) and t2 >= t1:
            _path("mul.b_ragged")
            zp = kernels.ragged_padded(t2) - t2
            return jax.vmap(kernels.mul_chunks_pallas_tiled_ragged)(a, b), False, 0, zp
        if kernels.mul_ragged_supported(t1):
            _path("mul.b_jm_ragged")
            zp = kernels.ragged_padded(t1) - t1
            return jax.vmap(kernels.mul_chunks_pallas_tiled_ragged)(b, a), True, zp, 0
        if 1 < t2 <= _JMAJOR_XLA_MAX_T2:
            _path("mul.b_jm_xla")
            return _jit_jmajor_xla()(a, b), True, 0, 0
    _path("mul.b_xla")
    return _jit_core_mul()(a, b), False, 0, 0


def permute_batched(words: jax.Array, plan) -> jax.Array:
    """Beneš permutation over a batch [B, W, C]: one plan, every element."""
    from csgn_tpu.ops import permute_benes as pb

    if (
        jax.default_backend() == "tpu"
        and words.ndim == 3
        and words.shape[0] * words.shape[-1] >= pb.BENES_PALLAS_MIN_C
    ):
        _path("permute.b_benes_pallas")
        return jax.vmap(lambda x: pb.apply_benes_pallas(x, plan))(words)
    _path("permute.b_benes_xla")
    return pb.apply_benes(words, plan)


def permute_batched_multi(words: jax.Array, stacked) -> jax.Array:
    """k DIFFERENT permutations over k ciphertexts [k, W, C]: fused Pallas at
    scale (plan i's masks selected by the batch grid index — the
    key-rotation-fleet pattern at the single-plan fused rate), XLA stacked
    delta-swaps otherwise."""
    from csgn_tpu.ops import permute_benes as pb

    if (
        jax.default_backend() == "tpu"
        and words.ndim == 3
        and words.shape[0] * words.shape[-1] >= pb.BENES_PALLAS_MIN_C
    ):
        _path("permute.b_multi_pallas")
        return pb.apply_benes_batch_pallas(words, stacked)
    _path("permute.b_multi_xla")
    return pb.apply_benes_batch(words, stacked)


def decrypt_parity(words: jax.Array, mask: jax.Array) -> jax.Array:
    """XLA eq-all decrypt — measured at HBM speed-of-light already."""
    return _jit_core_decrypt()(words, mask)


def permute(words: jax.Array, plan) -> jax.Array:
    """Beneš permutation: Pallas-fused on TPU at scale (all stages per VMEM
    block, 15-20x the XLA path at 2^20 chunks), XLA delta-swaps otherwise."""
    from csgn_tpu.ops import permute_benes as pb

    if jax.default_backend() == "tpu" and words.ndim == 2 and words.shape[-1] >= pb.BENES_PALLAS_MIN_C:
        _path("permute.benes_pallas")
        return pb.apply_benes_pallas(words, plan)
    _path("permute.benes_xla")
    return pb.apply_benes(words, plan)


@functools.cache
def _jit_permute_decrypt(n: int, n_pad: int, deltas, rows, use_pallas: bool):
    """ONE cached jit for staged permute+decrypt.  The plan's static schedule
    (deltas/rows) keys the cache; the per-permutation masks enter as a traced
    argument, so every same-size plan shares one compilation."""
    from csgn_tpu.ops import permute_benes as pb

    @jax.jit
    def pd(words, masks, mask):
        plan = pb.BenesPlan(n=n, n_pad=n_pad, deltas=deltas, masks=masks, rows=rows)
        out = (
            pb.apply_benes_pallas(words, plan)
            if use_pallas
            else pb.apply_benes(words, plan)
        )
        return out, core.decrypt_parity(out, mask)

    return pd


def permute_decrypt(words: jax.Array, plan, mask: jax.Array):
    """Permutation + decrypt in ONE jit dispatch: ``(permuted [W, C], parity)``.

    `mask` must be the key matching the OUTPUT (key-transform workflow: the
    permuted key's mask).  Bit-exact to `permute` + `decrypt_parity`.

    Unlike the multiply (HBM-bound, where in-kernel parity accumulation is
    free and deletes a full product read), the Beneš kernel is VPU-bound and
    its saved decrypt read is cheap — the fused variant
    (`pb.apply_benes_decrypt_pallas`) MEASURED SLOWER on chip (2.29 ms vs
    2.20 ms staged at 2^20 chunks; artifacts/permdec_r3.out): the in-kernel
    eq-all cross-sublane reduce costs more VPU time than the ~0.3 ms XLA
    read it avoids.  So this jits the STAGED pipeline (fused-Beneš Pallas
    permute + speed-of-light XLA decrypt) as one dispatch (one ~27 ms tunnel
    round trip, not two); the fused kernel stays available and tested for
    payloads that skip materializing the permuted output.
    """
    from csgn_tpu.ops import permute_benes as pb

    use_pallas = (
        jax.default_backend() == "tpu"
        and words.ndim == 2
        and words.shape[-1] >= pb.BENES_PALLAS_MIN_C
    )
    _path("permute_dec.staged_pallas" if use_pallas else "permute_dec.staged_xla")
    pd = _jit_permute_decrypt(plan.n, plan.n_pad, plan.deltas, plan.rows, use_pallas)
    return pd(words, jnp.asarray(plan.masks), mask)
