"""Examples must run and self-assert (small parameters)."""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "examples"))


def test_voting_example():
    import voting

    out = voting.main(voters=16, n=95, d=4)
    assert out["voters"] == 16
    assert out["parity"] in (0, 1) and out["unanimous"] in (0, 1)


def test_deep_chain_example():
    import deep_chain

    out = deep_chain.main(depth=12, recrypt_at=256)
    assert out["decrypted"] == 1
    assert out["recrypts"] >= 1
    assert out["peak_chunks"] <= 512
    assert out["unbounded_chunks_would_be"] == 2 ** 12


def test_sharded_pipeline_example():
    import sharded_pipeline

    out = sharded_pipeline.main(batch=16, n=95, d=4)
    assert out["devices"] >= 1
    assert out["product_chunks"] == out["batch"] ** 2


def test_deep_chain_32(small_ctx):
    """32-deep multiplication chain (BASELINE config 3 upper bound) with
    recrypt growth resets keeping peak chunks bounded."""
    import deep_chain

    out = deep_chain.main(depth=32, recrypt_at=1024)
    assert out["decrypted"] == 1
    assert out["depth"] == 32
    assert out["peak_chunks"] <= 2048
    assert out["unbounded_chunks_would_be"] == 2 ** 32


def test_key_rotation_example():
    import key_rotation

    out = key_rotation.main(fleet=6, n=95, d=4)
    assert out["decrypted"] == out["expected"]


def test_netlist_service_example():
    import netlist_service

    out = netlist_service.main(bidders=6, width=8, n=95, d=4)
    assert out["bidders"] == 6
    assert out["encrypt_dispatches"] == 1
    assert all(q in (0, 1) for q in out["qualified"])


def test_encrypted_aes_example():
    import encrypted_aes

    out = encrypted_aes.main(n=95, d=4)
    assert out["ciphertext"] == "69c4e0d86a7b0430d8cdb78070b4c55a"  # FIPS-197 C.1
    assert out["ands"] == 51_200


def test_encrypted_hmac_example():
    import hmac

    import encrypted_hmac

    out = encrypted_hmac.main(n=95, d=4)
    expect = hmac.new(bytes(range(32)), b"attested by csgn_tpu", "sha256")
    assert out["tag"] == expect.hexdigest()
    assert out["compressions"] == 4


def test_bristol_adder_example():
    import bristol_adder

    out = bristol_adder.main(x=2**63 + 12345, y=2**63 + 99999)
    assert out["sum"] == (2**63 + 12345 + 2**63 + 99999) % 2**64
    assert out["and_gates"] == 125
    assert out["decrypted_bits_checked"] == 64
