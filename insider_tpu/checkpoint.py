"""Checkpoint / resume for ALS runs.

The reference's only persistence is a manual `save(object, file=...)` after
the fit and incrementally flushed tuning CSVs (tests/ageing.R:47,
R/insider.R:130,172).  ALS state is tiny relative to the data (factors only),
so we snapshot the full state pytree — factors, PRNG key, iteration counter,
loss — enabling deterministic resume from (iter, key, factors)
(SURVEY.md §5, failure-recovery row).

Format: a single .npz (portable, no orbax dependency needed for arrays this
small) plus a JSON sidecar of scalars/config.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np

from insider_tpu.model.state import InsiderState


def save_checkpoint(path: str, state: InsiderState, it: int = 0,
                    loss: float = float("nan"),
                    extra: Optional[dict] = None) -> None:
    """Write state to `path` (.npz) + `path`.json atomically."""
    arrays = {}
    for i, f in enumerate(state.cfd_factors):
        arrays[f"cfd_{i}"] = np.asarray(f)
    if state.ctns_factor is not None:
        arrays["ctns"] = np.asarray(state.ctns_factor)
    arrays["column_factor"] = np.asarray(state.column_factor)
    arrays["key"] = np.asarray(state.key)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **arrays)
    os.replace(tmp, path)
    meta = {
        "n_cfd": len(state.cfd_factors),
        "has_ctns": state.ctns_factor is not None,
        "iter": int(it),
        "loss": float(loss),
        "extra": extra or {},
    }
    tmp = path + ".json.tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, path + ".json")


def load_checkpoint(path: str) -> Tuple[InsiderState, dict]:
    """Read (state, meta) from a save_checkpoint artifact."""
    import jax.numpy as jnp

    with open(path + ".json") as fh:
        meta = json.load(fh)
    z = np.load(path)
    cfd = [jnp.asarray(z[f"cfd_{i}"]) for i in range(meta["n_cfd"])]
    ctns = jnp.asarray(z["ctns"]) if meta["has_ctns"] else None
    state = InsiderState(cfd, ctns, jnp.asarray(z["column_factor"]),
                         jnp.asarray(z["key"]))
    return state, meta
