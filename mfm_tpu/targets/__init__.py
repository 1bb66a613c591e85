"""Target densities and the reference-distribution registry.

The ``REF_DISTS`` registry mirrors the reference's flow reference-distribution
table (/root/reference/exe_flow_matching.py:48-54).
"""

from mfm_tpu.targets.base import GeometricPath, Target, as_logprob_fn
from mfm_tpu.targets.cox import LogGaussianCoxPines
from mfm_tpu.targets.gaussian import (
    FlatDistribution,
    GaussianMixture,
    IndepGaussian,
    four_mode_mixture,
    random_mixture,
)
from mfm_tpu.targets.funnel import Funnel, ManyWell
from mfm_tpu.targets.phi_four import PhiFour, PhiFourBase

REF_DISTS = {
    "stdgauss": lambda dim: IndepGaussian(dim),
    "widegauss": lambda dim: IndepGaussian(dim, var=5.0),
    "bimodal": lambda dim: GaussianMixture(),
    "flat": lambda dim: FlatDistribution(dim),
    "phifour": lambda dim: PhiFourBase(dim),
}


def make_ref_dist(name: str, dim: int) -> Target:
    try:
        return REF_DISTS[name](dim)
    except KeyError:
        raise ValueError(f"unknown reference distribution {name!r}") from None


__all__ = [
    "Target",
    "GeometricPath",
    "as_logprob_fn",
    "IndepGaussian",
    "FlatDistribution",
    "GaussianMixture",
    "four_mode_mixture",
    "random_mixture",
    "Funnel",
    "ManyWell",
    "PhiFour",
    "PhiFourBase",
    "LogGaussianCoxPines",
    "REF_DISTS",
    "make_ref_dist",
]
