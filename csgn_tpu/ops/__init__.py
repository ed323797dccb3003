"""Compute ops: jnp oracles (`core`), Pallas TPU kernels (`kernels`), and
size/backend-aware dispatch (`dispatch`)."""

from csgn_tpu.ops.core import (
    add_chunks,
    chunk_matches,
    decrypt_parity,
    encrypt_bits,
    keygen,
    mul_chunks,
    permute_chunks,
)

__all__ = [
    "add_chunks",
    "chunk_matches",
    "decrypt_parity",
    "encrypt_bits",
    "keygen",
    "mul_chunks",
    "permute_chunks",
]
