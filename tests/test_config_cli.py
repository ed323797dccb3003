"""Config round-trips, CLI commands, and runtime validation checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csgn_tpu import Ciphertext, SecretKey
from csgn_tpu.config import RunConfig
from csgn_tpu.utils import checks


def test_runconfig_json_roundtrip():
    cfg = RunConfig(n=4095, d=32, seed=7, batch=64, mul_strategy="ring")
    back = RunConfig.from_json(cfg.to_json())
    assert back == cfg
    assert back.context().n == 4095


def test_runconfig_rejects_unknown_keys():
    with pytest.raises(ValueError):
        RunConfig.from_json('{"n": 10, "bogus": 1}')


def test_cli_demo_and_selftest(capsys):
    from csgn_tpu import cli

    assert cli.main(["demo", "--n", "95", "--d", "4"]) == 0
    out = capsys.readouterr().out
    assert "Dec ( Enc (1) + Enc (0) ) = 1" in out
    assert cli.main(["selftest", "--n", "95", "--d", "4"]) == 0
    assert cli.main(["info"]) == 0


def test_cli_flagship(capsys):
    from csgn_tpu import cli

    assert cli.main(["flagship", "--n", "95", "--d", "4"]) == 0
    out = capsys.readouterr().out
    assert "69c4e0d86a7b0430d8cdb78070b4c55a" in out  # FIPS-197 C.1
    assert "flagship OK" in out


def test_validate_ciphertext(ctx, rng):
    keys = jax.random.split(rng, 2)
    sk = SecretKey.generate(ctx, keys[0])
    ct = sk.encrypt(1, keys[1])
    checks.validate_ciphertext(ct)       # fresh ciphertexts are canonical
    checks.validate_key(sk)

    # Corrupt a padding bit -> must be rejected.
    wt = np.asarray(ct.wt).copy()
    wt[-1, 0] |= 1  # last word is entirely padding for n=1247
    bad = Ciphertext(jnp.asarray(wt), ctx)
    with pytest.raises(ValueError, match="non-canonical"):
        checks.validate_ciphertext(bad)


def test_checked_decrypt(ctx, rng):
    keys = jax.random.split(rng, 2)
    sk = SecretKey.generate(ctx, keys[0])
    ct = sk.encrypt(1, keys[1])
    err, parity = checks.checked_decrypt(
        ct.wt, jnp.asarray(sk.mask), jnp.asarray(ctx.valid_mask)
    )
    err.throw()
    assert int(parity) == 1

    wt = np.asarray(ct.wt).copy()
    wt[-1, 0] |= 1
    err, _ = checks.checked_decrypt(
        jnp.asarray(wt), jnp.asarray(sk.mask), jnp.asarray(ctx.valid_mask)
    )
    with pytest.raises(Exception, match="non-canonical"):
        err.throw()


def test_cli_timings_runs(capsys):
    from csgn_tpu import cli

    assert cli.main(["timings", "--n", "95", "--d", "4"]) == 0
    out = capsys.readouterr().out
    assert "keygen" in out and "multiply" in out
