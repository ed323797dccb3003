"""SHA-256 netlist: hashlib is the oracle; growth-free homomorphic digests.

Complements tests/test_aes.py at published-suite scale (~125k gates): the
compression circuit must reproduce `hashlib.sha256` bit for bit — including
multi-block chaining through the Davies–Meyer feed-forward — and compute
the digest of an ENCRYPTED message via the expr path.
"""

import hashlib
import random
import struct

import jax
import pytest

from csgn_tpu import SecretKey
from csgn_tpu.circuit import CHUNKS_SAT
from csgn_tpu.models.sha256 import (
    SHA256_IV,
    sha256_compress,
    sha256_pad,
    sha256_pad_one_block,
)
from csgn_tpu.models.netlist import (
    Netlist,
    bits_from_bytes as _bits,
    bytes_from_bits as _unbits,
    eval_expr,
    eval_plain,
)

_IV_BYTES = b"".join(struct.pack(">I", h) for h in SHA256_IV)


@pytest.fixture(scope="module")
def nl() -> Netlist:
    return sha256_compress()


def test_shape(nl):
    assert nl.input_sizes == (512, 256) and nl.output_sizes == (256,)
    assert nl.and_count == 46_840
    assert max(nl.growth()) == CHUNKS_SAT  # AND-depth ~2000: expr path only


def test_known_vectors_vs_hashlib(nl):
    for msg in (b"", b"abc", b"The quick brown fox jumps over the lazy dog"):
        (out,) = eval_plain(nl, [_bits(sha256_pad_one_block(msg)), _bits(_IV_BYTES)])
        assert _unbits(out) == hashlib.sha256(msg).digest(), msg


def test_random_one_block_vs_hashlib(nl):
    rnd = random.Random(0x5A256)
    for _ in range(5):
        msg = bytes(rnd.getrandbits(8) for _ in range(rnd.randrange(56)))
        (out,) = eval_plain(nl, [_bits(sha256_pad_one_block(msg)), _bits(_IV_BYTES)])
        assert _unbits(out) == hashlib.sha256(msg).digest(), msg


def test_multi_block_chaining(nl):
    """Output-state format == input-state format: chaining compressions over
    `sha256_pad` blocks hashes arbitrary lengths (here 3 blocks)."""
    msg = bytes(range(256))[:150]
    blocks = sha256_pad(msg)
    assert len(blocks) == 3
    state = _IV_BYTES
    for block in blocks:
        (out,) = eval_plain(nl, [_bits(block), _bits(state)])
        state = _unbits(out)
    assert state == hashlib.sha256(msg).digest()
    with pytest.raises(ValueError, match="one padded block"):
        sha256_pad_one_block(bytes(56))


def test_file_roundtrip_at_scale(nl, tmp_path):
    p = tmp_path / "sha256.txt"
    p.write_text(nl.to_text())
    again = Netlist.parse(p.read_text())
    assert again == nl


def test_homomorphic_digest_of_encrypted_message(nl, small_ctx):
    """Encrypt the padded block AND the IV bit-by-bit; the evaluator computes
    the digest circuit without the key; the key holder reads out 256 bits
    that equal hashlib's digest of the secret message."""
    msg = b"csgn_tpu"
    keys = jax.random.split(jax.random.key(0x5A256), 3)
    sk = SecretKey.generate(small_ctx, keys[0])
    one = sk.encrypt(1, keys[1])
    ks = jax.random.split(keys[2], 768)
    enc_block = [
        sk.encrypt(b, ks[i]) for i, b in enumerate(_bits(sha256_pad_one_block(msg)))
    ]
    enc_iv = [sk.encrypt(b, ks[512 + i]) for i, b in enumerate(_bits(_IV_BYTES))]
    (outs,) = eval_expr(nl, [enc_block, enc_iv], one)
    got = _unbits([int(v) for v in sk.decrypt_circuits(outs)])
    assert got == hashlib.sha256(msg).digest()
