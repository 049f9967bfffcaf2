"""Render checkpoint / resume.

The reference has no checkpointing (SURVEY §5); its natural checkpoint
boundary is the film between AA passes (imagefilm.cc:213-286 re-enters
accumulated weights) plus the pass/sample counters that fully determine the
QMC stream.  We serialize exactly that state — film buffers, pass index,
sample offset — so an interrupted progressive render resumes bit-exactly
(QMC sample indices are pure functions of (pixel, pass_offs + s)).
"""
from __future__ import annotations

import json
import os

import numpy as np
import jax.numpy as jnp

from core_tpu.film import Film

MAGIC = "core_tpu_checkpoint_v1"


def save_checkpoint(path: str, film: Film, pass_idx: int, sample_offs: int,
                    meta: dict | None = None):
    """Atomic write of film + progress counters (npz + json header)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, magic=MAGIC,
                 rgba=np.asarray(film.rgba), weight=np.asarray(film.weight),
                 density=np.asarray(film.density),
                 n_density=np.asarray(film.n_density),
                 pass_idx=pass_idx, sample_offs=sample_offs,
                 meta=json.dumps(meta or {}))
    os.replace(tmp, path)


def load_checkpoint(path: str):
    """Returns (film, pass_idx, sample_offs, meta) or None if absent."""
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        assert str(z["magic"]) == MAGIC, "not a core_tpu checkpoint"
        h, w = z["weight"].shape
        film = Film(rgba=jnp.asarray(z["rgba"]),
                    weight=jnp.asarray(z["weight"]),
                    density=jnp.asarray(z["density"]) if "density" in z
                    else jnp.zeros((h, w, 3), jnp.float32),
                    n_density=jnp.asarray(z["n_density"]) if "n_density" in z
                    else jnp.zeros((), jnp.float32))
        return (film, int(z["pass_idx"]), int(z["sample_offs"]),
                json.loads(str(z["meta"])))


SPPM_MAGIC = "core_tpu_sppm_checkpoint_v1"


def save_sppm_checkpoint(path: str, state, pass_idx: int):
    """SPPM progressive state (per-pixel HitPoints + pass counter) — the
    natural SPPM checkpoint boundary SURVEY §5 names (sppm.h:41-48 holds
    ALL cross-pass state; the photon QMC stream is a pure function of the
    pass index, so resumption is bit-exact)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, magic=SPPM_MAGIC,
                 r2=np.asarray(state.r2), acc_n=np.asarray(state.acc_n),
                 tau=np.asarray(state.tau), direct=np.asarray(state.direct),
                 pass_idx=pass_idx)
    os.replace(tmp, path)


def load_sppm_checkpoint(path: str):
    """Returns (HitPoints, pass_idx) or None if absent."""
    if not os.path.exists(path):
        return None
    from core_tpu.integrators.sppm import HitPoints
    with np.load(path, allow_pickle=False) as z:
        assert str(z["magic"]) == SPPM_MAGIC, "not an SPPM checkpoint"
        state = HitPoints(r2=jnp.asarray(z["r2"]),
                          acc_n=jnp.asarray(z["acc_n"]),
                          tau=jnp.asarray(z["tau"]),
                          direct=jnp.asarray(z["direct"]))
        return state, int(z["pass_idx"])
