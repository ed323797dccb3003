"""Backend/size-aware op dispatch: Pallas kernels where they win, XLA where it
is already at speed-of-light (measurements in docs/performance.md)."""

from __future__ import annotations

import functools

import jax

from csgn_tpu.ops import core, kernels

__all__ = ["mul_chunks", "decrypt_parity"]


@functools.cache
def _jit_core_mul():
    return jax.jit(core.mul_chunks)


@functools.cache
def _jit_core_decrypt():
    return jax.jit(core.decrypt_parity)


def mul_chunks(a: jax.Array, b: jax.Array) -> jax.Array:
    """[W,t1] x [W,t2] -> [W,t1*t2].  Pallas on TPU for large outputs (pure
    output-streaming, ~3x less HBM traffic than XLA's broadcast fusion);
    XLA otherwise (small ops are dispatch-bound)."""
    t_out = a.shape[-1] * b.shape[-1]
    if (
        jax.default_backend() == "tpu"
        and a.ndim == 2
        and t_out >= kernels.MUL_PALLAS_MIN_OUT
        and kernels.mul_pallas_supported(a.shape[-1], b.shape[-1], a.shape[0])
    ):
        return kernels.mul_chunks_pallas(a, b)
    return _jit_core_mul()(a, b)


def decrypt_parity(words: jax.Array, mask: jax.Array) -> jax.Array:
    """XLA eq-all decrypt — measured at HBM speed-of-light already."""
    return _jit_core_decrypt()(words, mask)


def permute(words: jax.Array, plan) -> jax.Array:
    """Beneš permutation: Pallas-fused on TPU at scale (all stages per VMEM
    block, 15-20x the XLA path at 2^20 chunks), XLA delta-swaps otherwise."""
    from csgn_tpu.ops import permute_benes as pb

    if jax.default_backend() == "tpu" and words.ndim == 2 and words.shape[-1] >= pb.BENES_PALLAS_MIN_C:
        return pb.apply_benes_pallas(words, plan)
    return pb.apply_benes(words, plan)
