"""Glass / rough-glass material family — implemented in a later milestone
this round (reference src/materials/glass.cc, roughglass.cc)."""
from __future__ import annotations


def _todo(*a, **k):
    raise NotImplementedError("glass material family: pending milestone")


eval_bsdf = sample_bsdf = pdf_bsdf = get_specular = transparency = _todo
