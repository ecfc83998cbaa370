"""Volume ingestion tests: minimal NIfTI-1 reader, TIFF stacks, slicing."""

import gzip
import os
import struct

import numpy as np
import pytest


def _write_nifti(path, vol, gz=False):
    """Write a minimal valid NIfTI-1 file (float32, no scaling)."""
    ndim = vol.ndim
    dim = [ndim] + list(vol.shape) + [1] * (7 - ndim)
    hdr = bytearray(352)
    struct.pack_into("<i", hdr, 0, 348)
    struct.pack_into("<8h", hdr, 40, *dim)
    struct.pack_into("<h", hdr, 70, 16)  # float32
    struct.pack_into("<h", hdr, 72, 32)  # bitpix
    struct.pack_into("<f", hdr, 108, 352.0)  # vox_offset
    struct.pack_into("<f", hdr, 112, 1.0)  # scl_slope
    struct.pack_into("<f", hdr, 116, 0.0)  # scl_inter
    hdr[344:348] = b"n+1\x00"
    payload = bytes(hdr) + np.asfortranarray(vol.astype(np.float32)).tobytes(order="F")
    opener = gzip.open if gz else open
    with opener(path, "wb") as f:
        f.write(payload)


class TestNifti:
    @pytest.mark.parametrize("gz", [False, True])
    def test_roundtrip(self, tmp_path, rng, gz):
        from srgan_st_tpu.data.volumes import read_nifti

        vol = rng.random((6, 5, 4)).astype(np.float32)
        path = str(tmp_path / ("v.nii.gz" if gz else "v.nii"))
        _write_nifti(path, vol, gz=gz)
        got, info = read_nifti(path)
        assert info["shape"] == (6, 5, 4)
        np.testing.assert_allclose(got, vol, atol=1e-7)

    def test_rejects_garbage(self, tmp_path):
        from srgan_st_tpu.data.volumes import read_nifti

        path = str(tmp_path / "junk.nii")
        with open(path, "wb") as f:
            f.write(b"\x00" * 400)
        with pytest.raises(ValueError):
            read_nifti(path)


class TestTiffAndSlicing:
    def test_tiff_stack(self, tmp_path, rng):
        from PIL import Image

        from srgan_st_tpu.data.volumes import read_tiff_stack

        frames = [(rng.random((8, 10)) * 255).astype(np.uint8) for _ in range(3)]
        path = str(tmp_path / "stack.tif")
        Image.fromarray(frames[0]).save(
            path, save_all=True, append_images=[Image.fromarray(f) for f in frames[1:]]
        )
        got = read_tiff_stack(path)
        assert got.shape == (3, 8, 10)
        np.testing.assert_array_equal(got[1], frames[1])

    def test_slice_volume_to_images(self, tmp_path, rng):
        from srgan_st_tpu.data.volumes import slice_volume_to_images

        vol = rng.random((4, 32, 40)).astype(np.float32) * 1000
        out = str(tmp_path / "slices")
        n = slice_volume_to_images(vol, out, axis=0, stride=2)
        assert n == 2
        files = sorted(os.listdir(out))
        assert files[0] == "slice_00000.png"
        from PIL import Image

        with Image.open(os.path.join(out, files[0])) as im:
            assert im.size == (40, 32)
            arr = np.asarray(im)
        assert arr.shape == (32, 40, 3)
        assert arr.max() > 200  # normalized to the full range


def test_feature_maps_render(tmp_path, rng):
    from PIL import Image

    from srgan_st_tpu.core.config import Config
    from srgan_st_tpu.viz.feature_maps import render_feature_maps

    img = (rng.random((96, 96, 3)) * 255).astype(np.uint8)
    path = str(tmp_path / "im.png")
    Image.fromarray(img).save(path)
    config = Config()
    config.MODEL.D_N_CHANNEL = 8  # small for CPU
    written = render_feature_maps(config, path, "disc", str(tmp_path / "figs"))
    assert len(written) == 2  # features.4 and features.10
    with Image.open(written[0]) as im:
        assert im.size[0] > 0


def test_buddy_illustration(tmp_path, rng):
    """viz/buddy_illustration smoke (reference visualizations.ipynb
    counterpart): marked image + per-buddy crops, duplicate patch found."""
    from PIL import Image

    from srgan_st_tpu.viz.buddy_illustration import buddy_illustration

    # image with an exact duplicate of the target patch elsewhere: the
    # duplicate must be the rank-1 buddy at full scale with score ~0
    img = (rng.random((60, 75, 3)) * 255).astype(np.uint8)
    img[15:30, 30:45] = img[0:15, 0:15]  # grid (1,2) == grid (0,0)
    path = str(tmp_path / "im.png")
    Image.fromarray(img).save(path)

    meta = buddy_illustration(path, (0, 0), k=3, ksize=15,
                              out_dir=str(tmp_path / "figs"))
    assert meta["grid"] == (4, 5)
    b1 = meta["buddies"][0]
    assert (b1["scale"], b1["row"], b1["col"]) == (1.0, 1, 2)
    # fp32 reassociation in the ||x||^2+||y||^2-2xy form leaves ~1e-5 on an
    # exact duplicate; random-patch scores are O(10)
    assert b1["score"] < 1e-3
    # target crop + k buddy crops + marked canvas
    assert len(meta["written"]) == 1 + 3 + 1
    for p in meta["written"]:
        assert os.path.exists(p)
    with Image.open(meta["written"][-1]) as im:
        arr = np.asarray(im)
    assert arr.shape == (60, 75, 3)
    # blue target box and a red buddy box were drawn
    assert (arr[0:15, 0:2] == (0, 0, 255)).all(axis=-1).any()
    assert (arr[15:31, 30:32] == (255, 0, 0)).all(axis=-1).any()
