"""End-to-end run driven by the ported production FLAMINGO.yml.

Exercises the parameter-file contract (reference
``SOAP/core/parameter_file.py:120-154``, ``parameter_files/FLAMINGO.yml``):

 - ``calculate_missing_properties: false`` + explicit property lists ->
   the catalogue contains EXACTLY the enabled implemented datasets;
 - variation-level ``filter:`` categories mask whole groups and are
   recorded in the group attrs;
 - per-dataset mask metadata matches the property's category;
 - output-file parity: Cells group, SWIFT metadata copy, Parameters
   provenance, NumSubhalos header attrs.
"""

import os

import h5py
import numpy as np
import pytest
import yaml

from soap_tpu.core.halo_types import implemented_keys_for
from soap_tpu.core.params import ParameterFile, substitute_parameters
from soap_tpu.core.registry import full_property_table
from soap_tpu.pipeline.membership import run_group_membership
from soap_tpu.pipeline.run import compute_halo_properties

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def flamingo_catalogue(tmp_path_factory, mock_sim):
    workdir = str(tmp_path_factory.mktemp("flamingo_e2e"))
    with open(os.path.join(REPO, "parameter_files", "FLAMINGO.yml")) as f:
        raw = yaml.safe_load(f)
    # small box: shrink the production 5 cMpc read floor
    raw["calculations"]["min_read_radius_cmpc"] = 0.005
    raw = substitute_parameters(
        raw, {"sim_dir": workdir, "output_dir": workdir, "scratch_dir": workdir}
    )
    params = ParameterFile(parameter_dictionary=raw)
    membership = os.path.join(workdir, "membership.hdf5")
    run_group_membership(
        mock_sim["snapshot"], mock_sim["hbt_basename"], membership
    )
    output = os.path.join(workdir, "halo_properties.hdf5")
    run = compute_halo_properties(
        snapshot_file=mock_sim["snapshot"],
        membership_file=membership,
        halo_basename=mock_sim["hbt_basename"],
        output_file=output,
        parameter_file=params,
        dmo=True,
        verbose=False,
    )
    return output, params, run


def _enabled_names(params, base, halo_type):
    """Expected output names: enabled in the file AND implemented (DMO)."""
    table = full_property_table()
    listed = params.get_parameters()[base]["properties"]
    implemented = {table[k].name for k in implemented_keys_for(halo_type, True)}
    return {n for n, v in listed.items() if v is not False} & implemented


def test_exact_dataset_set(flamingo_catalogue):
    output, params, _ = flamingo_catalogue
    with h5py.File(output) as f:
        sub = set(f["BoundSubhalo"].keys())
        expected = _enabled_names(params, "SubhaloProperties", "BoundSubhalo")
        assert sub == expected, (
            f"extra={sorted(sub - expected)}, missing={sorted(expected - sub)}"
        )
        # a property implemented for DMO but not listed in FLAMINGO.yml
        # must be absent (calculate_missing_properties: false)
        assert "ExSituFraction" not in sub

        so = set(f["SO/200_crit"].keys())
        expected_so = _enabled_names(params, "SOProperties", "SO")
        assert so == expected_so, (
            f"extra={sorted(so - expected_so)}, "
            f"missing={sorted(expected_so - so)}"
        )

        # core-excised variation carries the CE extras too
        ce = set(f["SO/500_crit"].keys())
        expected_ce = expected_so | _enabled_names(
            params, "SOProperties", "CoreExcisedSO"
        )
        assert ce == expected_ce


def test_variation_filter_masks_group(flamingo_catalogue):
    output, params, run = flamingo_catalogue
    with h5py.File(output) as f:
        # 50_crit has `filter: general`; group attrs record the mask
        g = f["SO/50_crit"]
        assert bool(g.attrs["Masked"]) is True
        assert int(g.attrs["Mask Threshold"]) == 100
        # 200_crit has no filter -> unmasked group
        assert bool(f["SO/200_crit"].attrs["Masked"]) is False

        # halos failing `general` (DMO: < 100 DM particles) are zeroed in
        # 50_crit but not in 200_crit
        ndm = f["BoundSubhalo/NumberOfDarkMatterParticles"][...]
        m50 = f["SO/50_crit/TotalMass"][...]
        m200 = f["SO/200_crit/TotalMass"][...]
        fails = ndm < 100
        if fails.any():
            assert np.all(m50[fails] == 0)
        passes = (ndm >= 100) & (m200 > 0)
        if passes.any():
            assert np.all(m50[passes] >= 0)


def test_dataset_mask_metadata(flamingo_catalogue):
    output, _, _ = flamingo_catalogue
    with h5py.File(output) as f:
        # TotalMass is 'basic' -> unmasked
        assert not f["BoundSubhalo/TotalMass"].attrs["Masked"]
        # HalfMassRadiusDarkMatter is 'dm' -> masked with the dm filter
        ds = f["BoundSubhalo/HalfMassRadiusDarkMatter"]
        assert bool(ds.attrs["Masked"]) is True
        assert int(ds.attrs["Mask Threshold"]) == 100
        assert [
            d.decode() if isinstance(d, bytes) else d
            for d in ds.attrs["Mask Datasets"]
        ] == ["BoundSubhalo/NumberOfDarkMatterParticles"]


def test_output_file_parity(flamingo_catalogue):
    output, _, run = flamingo_catalogue
    with h5py.File(output) as f:
        # Cells group: spatial index over the snapshot's top-level cells
        n_halos = int(f["Header"].attrs["NumSubhalos_Total"][0])
        counts = f["Cells/Counts/Subhalos"][...]
        offsets = f["Cells/OffsetsInFile/Subhalos"][...]
        assert counts.sum() == n_halos
        np.testing.assert_array_equal(
            offsets, np.cumsum(counts) - counts
        )
        assert f["Cells/Centres"].shape[1] == 3
        assert "dimension" in f["Cells/Meta-data"].attrs
        # sorted order is consistent with the cell assignment: the halos
        # of cell c occupy rows [offset, offset+count)
        centres = f["InputHalos/HaloCentre"][...]
        dims = f["Cells/Meta-data"].attrs["dimension"]
        size = f["Cells/Meta-data"].attrs["size"]
        ijk = np.clip(
            np.floor(centres / size).astype(np.int64), 0, np.asarray(dims) - 1
        )
        flat = (ijk[:, 0] * dims[1] + ijk[:, 1]) * dims[2] + ijk[:, 2]
        assert np.all(np.diff(flat) >= 0)

        # SWIFT metadata copy + provenance
        assert "SWIFT/Header" in f and "SWIFT/Parameters" in f
        assert "PhysicalConstants/CGS" in f
        assert f["Code"].attrs["git_hash"] is not None
        assert "calculations" in f["Parameters"].attrs
        assert "SubhaloTypes" in f["Header"].attrs
        subhalo_types = [
            s.decode() if isinstance(s, bytes) else s
            for s in f["Header"].attrs["SubhaloTypes"]
        ]
        assert "SO/200_crit" in subhalo_types
        assert "InputHalos" in subhalo_types
