"""Run configuration (SURVEY.md §5 config target).

The reference hard-codes Context(1247, 16) in every test
(reference tests/basic_operations.cpp:14); here a frozen config dataclass
carries scheme parameters, mesh shape, sharding and RNG seed, serializable
to/from JSON for the CLI and bench harness.
"""

from __future__ import annotations

import dataclasses
import json

from csgn_tpu.context import Context

__all__ = ["RunConfig"]


@dataclasses.dataclass(frozen=True)
class RunConfig:
    """Scheme + execution parameters for CLI/bench runs."""

    n: int = 1247
    d: int = 16
    seed: int = 0
    batch: int = 1024          # batched-encryption workload size
    mesh_devices: int = 0      # 0 = all visible devices
    mul_strategy: str = "allgather"  # or "ring"

    def context(self) -> Context:
        return Context(self.n, self.d)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "RunConfig":
        data = json.loads(text)
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(data) - known
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        return cls(**data)
