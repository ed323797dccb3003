"""Elastic recovery: checkpoint -> resume on a different mesh size.

The recovery unit is the checkpoint (SURVEY.md §5): snapshots carry no
sharding, so a resumed job can re-lay the chunk axis onto whatever mesh it
comes back with.  Simulates "losing hosts" by resuming 8-device work on 4-
and 2-device meshes (and vice versa).
"""

import jax
import numpy as np
import pytest

from csgn_tpu import SecretKey
from csgn_tpu import io as cio
from csgn_tpu.ops import core
from csgn_tpu.parallel import sharded_decrypt_parity, sharded_mul_allgather
from csgn_tpu.parallel.mesh import chunk_mesh
from csgn_tpu.parallel.multihost import pad_chunks_to, shard_ciphertext


@pytest.mark.parametrize("resume_devices", [2, 4, 6, 8])
def test_checkpoint_resume_across_mesh_sizes(tmp_path, ctx, resume_devices):
    keys = jax.random.split(jax.random.key(0), 3)
    sk = SecretKey.generate(ctx, keys[0])

    # Phase 1 on an 8-device mesh: build an 8-chunk ciphertext and square it.
    mesh8 = chunk_mesh(8)
    bits = np.array([1, 0, 1, 1, 0, 1, 1, 1], dtype=np.uint8)
    words = sk.encrypt_batch(bits, keys[1])
    from csgn_tpu import Ciphertext

    ct = Ciphertext(words, ctx)
    ct8 = shard_ciphertext(ct, mesh8)
    prod = Ciphertext(sharded_mul_allgather(ct8.wt, ct8.wt, mesh8), ctx)

    # "Failure": checkpoint everything, drop the mesh.
    cio.save_state(tmp_path / "ckpt.npz", {"prod": prod, "sk": sk})

    # Phase 2: resume on a smaller (or same) mesh.
    state = cio.load_state(tmp_path / "ckpt.npz")
    mesh_r = chunk_mesh(resume_devices)
    prod_r = shard_ciphertext(state["prod"], mesh_r)
    mask = np.asarray(state["sk"].mask)
    import jax.numpy as jnp

    got = int(sharded_decrypt_parity(prod_r.wt, jnp.asarray(mask), mesh_r))
    want = int(core.decrypt_parity(prod.wt, jnp.asarray(mask)))
    assert got == want == (int(bits.sum()) % 2) ** 2 % 2


def test_pad_chunks_neutrality(ctx, rng):
    keys = jax.random.split(rng, 2)
    sk = SecretKey.generate(ctx, keys[0])
    ct = sk.encrypt(1, keys[1])
    padded, orig = pad_chunks_to(ct, 8)
    assert orig == 1 and padded.chunks == 8
    assert int(sk.decrypt(padded)) == int(sk.decrypt(ct))
