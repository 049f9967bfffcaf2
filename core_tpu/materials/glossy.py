"""Glossy (Ashikhmin-Shirley) material family — implemented in a later
milestone this round (reference src/materials/glossy2.cc, coatedglossy.cc,
include/materials/microfacet.h)."""
from __future__ import annotations


def _todo(*a, **k):
    raise NotImplementedError("glossy material family: pending milestone")


eval_bsdf = sample_bsdf = pdf_bsdf = get_specular = transparency = _todo
