"""Dependency-free NIfTI-1 writer/reader tests (reference output parity)."""

import numpy as np
import pytest

from ldm3d_tpu.utils.nifti import read_nifti, write_nifti


@pytest.mark.parametrize("ext", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.float32, np.int16])
def test_roundtrip(tmp_path, ext, dtype):
    rng = np.random.default_rng(0)
    vol = (rng.random((7, 5, 9)) * 100).astype(dtype)
    path = str(tmp_path / f"v{ext}")
    write_nifti(path, vol, zooms=(2.0, 1.0, 0.5))
    back, zooms = read_nifti(path)
    np.testing.assert_array_equal(back, vol)
    np.testing.assert_allclose(zooms, [2.0, 1.0, 0.5])
    assert back.dtype == np.dtype(dtype)


def test_header_fields(tmp_path):
    import gzip
    import struct

    path = str(tmp_path / "v.nii.gz")
    write_nifti(path, np.zeros((4, 4, 4), np.float32))
    raw = gzip.open(path, "rb").read()
    assert struct.unpack_from("<i", raw, 0)[0] == 348  # sizeof_hdr
    assert raw[344:348] == b"n+1\x00"                  # single-file magic
    assert struct.unpack_from("<h", raw, 70)[0] == 16  # float32 datatype
    assert struct.unpack_from("<f", raw, 108)[0] == 352.0  # vox_offset
    assert len(raw) == 352 + 4 * 64


def test_rejects_bad_inputs(tmp_path):
    with pytest.raises(ValueError, match="3-D"):
        write_nifti(str(tmp_path / "x.nii"), np.zeros((2, 2), np.float32))
    with pytest.raises(ValueError, match="dtype"):
        write_nifti(str(tmp_path / "x.nii"), np.zeros((2, 2, 2), np.complex64))
    (tmp_path / "junk.nii").write_bytes(b"\x00" * 400)
    with pytest.raises(ValueError, match="NIfTI"):
        read_nifti(str(tmp_path / "junk.nii"))


def test_nibabel_compat(tmp_path):
    """When nibabel is installed, our files must load in it and vice versa."""
    nib = pytest.importorskip("nibabel")
    vol = np.random.default_rng(1).random((6, 5, 4)).astype(np.float32)
    ours = str(tmp_path / "ours.nii.gz")
    write_nifti(ours, vol)
    loaded = np.asanyarray(nib.load(ours).dataobj)
    np.testing.assert_allclose(loaded, vol, rtol=1e-6)

    theirs = str(tmp_path / "theirs.nii.gz")
    nib.save(nib.Nifti1Image(vol, np.eye(4)), theirs)
    back, _ = read_nifti(theirs)
    np.testing.assert_allclose(back, vol, rtol=1e-6)


def test_save_volume_writes_nifti(tmp_path):
    from ldm3d_tpu.cli.inference import save_volume

    vol = np.random.default_rng(2).random((4, 4, 4)).astype(np.float32)
    path = save_volume(vol, str(tmp_path), "sample")
    assert path.endswith(".nii.gz")
    back, _ = read_nifti(path)
    np.testing.assert_array_equal(back, vol)


def test_4d_multichannel_roundtrip(tmp_path):
    """Multi-channel volumes (reference config_train_16g is 2-channel) write
    as dim[0]=4 NIfTI and round-trip exactly; serving 'nii' output uses this."""
    vol = np.random.default_rng(3).random((5, 6, 7, 2)).astype(np.float32)
    path = write_nifti(str(tmp_path / "mc.nii.gz"), vol)
    back, zooms = read_nifti(path)
    assert back.shape == (5, 6, 7, 2)
    np.testing.assert_array_equal(back, vol)

    nib = pytest.importorskip("nibabel")
    loaded = np.asanyarray(nib.load(path).dataobj)
    np.testing.assert_allclose(loaded, vol, rtol=1e-6)


def test_header_regular_and_dim_info_fields(tmp_path):
    """'r' belongs at offset 38 (regular); offset 39 (dim_info) must stay 0 —
    a nonzero dim_info claims MRI frequency/slice-encoding directions that
    generated volumes do not have (found in review: 'r' was packed into 39)."""
    vol = np.zeros((3, 3, 3), np.float32)
    path = write_nifti(str(tmp_path / "h.nii"), vol)
    raw = open(path, "rb").read()
    assert raw[38] == 114  # 'r'
    assert raw[39] == 0    # dim_info unset
    nib = pytest.importorskip("nibabel")
    img = nib.load(path)
    assert img.header.get_dim_info() == (None, None, None)
