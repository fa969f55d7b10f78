"""Apertures sized by a previously computed property (e.g. twice the
stellar half-mass radius), reference ``aperture_properties.py:3909-3915``."""

import numpy as np
import pytest

from soap_tpu.core.params import ParameterFile
from soap_tpu.pipeline.engine import HaloTypeSpec
from soap_tpu.pipeline.membership import run_group_membership
from soap_tpu.pipeline.run import compute_halo_properties
from soap_tpu.pipeline.specs import build_specs


def test_spec_builder_parses_property_apertures():
    params = ParameterFile(
        parameter_dictionary={
            "ApertureProperties": {
                "variations": {
                    "exclusive_50_kpc": {"radius_in_kpc": 50.0, "inclusive": False},
                    "exclusive_twice_halfmass": {
                        "inclusive": False,
                        "property": "BoundSubhalo/HalfMassRadiusTotal",
                        "radius_multiple": 2.0,
                    },
                }
            }
        }
    )
    specs = build_specs(params, True, bn98_value=100.0, so=False, projected=False)
    prop_specs = [s for s in specs if s.radius_property is not None]
    assert len(prop_specs) == 1
    s = prop_specs[0]
    assert s.group == "ExclusiveSphere/2xHalfMassRadiusTotal"
    assert s.radius_property == ("BoundSubhalo", "HalfMassRadiusTot", 2.0)


def test_property_aperture_values(tmp_path):
    from soap_tpu.utils.mock_data import make_mock_simulation

    sim = make_mock_simulation(
        str(tmp_path), n_halos=5, n_field=2500, boxsize=16.0, seed=41
    )
    mem = str(tmp_path / "mem.hdf5")
    run_group_membership(sim["snapshot"], sim["hbt_basename"], mem)
    specs = [
        HaloTypeSpec(
            kind="bound", group="BoundSubhalo", keys=("Mtot", "HalfMassRadiusTot")
        ),
        HaloTypeSpec(
            kind="aperture",
            group="ExclusiveSphere/2xHalfMassRadiusTotal",
            keys=("Mtot", "Ndm"),
            inclusive=False,
            radius_property=("BoundSubhalo", "HalfMassRadiusTot", 2.0),
        ),
    ]
    run = compute_halo_properties(
        sim["snapshot"], mem, sim["hbt_basename"], None,
        dmo=True, specs=specs, verbose=False,
    )
    hmr = run.results["BoundSubhalo"]["HalfMassRadiusTot"]
    m_ap = run.results["ExclusiveSphere/2xHalfMassRadiusTotal"]["Mtot"]
    m_bound = run.results["BoundSubhalo"]["Mtot"]
    # more than half the bound mass lies within 2 x half-mass radius,
    # and never more than the full bound mass
    assert np.all(m_ap > 0.5 * m_bound)
    assert np.all(m_ap <= m_bound * (1 + 1e-6))
    assert np.all(hmr > 0)
