"""Data pipeline tests: tiling CLI, pack format, sources, deterministic
per-epoch order."""

import os

import numpy as np
from PIL import Image

from srgan_st_tpu.data.pipeline import (
    PackedPatchSource,
    SyntheticPatchSource,
    TrainPatchSource,
    make_train_source,
)
from srgan_st_tpu.data.prepare_dataset import main as prepare_main


def _write_images(d, n=3, h=200, w=300, rng=None):
    rng = rng or np.random.default_rng(0)
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(d, f"im{i}.png"))


class TestPrepareDataset:
    def test_tile_counts_and_naming(self, tmp_path, rng):
        src = str(tmp_path / "orig")
        out = str(tmp_path / "train")
        _write_images(src, n=2, h=200, w=300, rng=rng)
        prepare_main([
            "--input_dir", src, "--output_dir", out,
            "--output_size", "96", "--step_size", "96", "--num_workers", "2",
        ])
        files = sorted(os.listdir(out))
        # 200x300 on a 96-raster: 2 rows x 3 cols = 6 per image
        assert len(files) == 12
        assert files[0] == "im0_0001.png"
        with Image.open(os.path.join(out, files[0])) as im:
            assert im.size == (96, 96)

    def test_pack(self, tmp_path, rng):
        src = str(tmp_path / "orig")
        out = str(tmp_path / "train")
        _write_images(src, n=1, h=192, w=192, rng=rng)
        prepare_main([
            "--input_dir", src, "--output_dir", out, "--num_workers", "1", "--pack",
        ])
        pack = np.load(os.path.join(out, "patches.pack.npy"), mmap_mode="r")
        assert pack.shape == (4, 96, 96, 3) and pack.dtype == np.uint8
        # pack contents match the individual patch files
        with Image.open(os.path.join(out, "im0_0001.png")) as im:
            np.testing.assert_array_equal(pack[0], np.asarray(im))


class TestSources:
    def test_packed_source_prefers_pack(self, tmp_path, rng):
        from srgan_st_tpu.core.config import Config

        src = str(tmp_path / "orig")
        out = str(tmp_path / "train")
        _write_images(src, n=2, h=192, w=192, rng=rng)
        prepare_main(["--input_dir", src, "--output_dir", out,
                      "--num_workers", "1", "--pack"])
        config = Config()
        config.DATA.TRAIN_GT_IMAGES_DIR = out
        config.DATA.BATCH_SIZE = 4
        source = make_train_source(config)
        assert isinstance(source, PackedPatchSource)
        assert len(source) == 2  # 8 patches / batch 4
        batches = list(source.epoch(0))
        assert len(batches) == 2
        assert batches[0].shape == (4, 96, 96, 3)

    def test_deterministic_epoch_order(self, tmp_path, rng):
        out = str(tmp_path / "train")
        _write_images(out, n=8, h=96, w=96, rng=rng)
        a = TrainPatchSource(out, batch_size=4, seed=7, num_workers=1)
        b = TrainPatchSource(out, batch_size=4, seed=7, num_workers=1)
        for ea, eb in zip(a.epoch(3), b.epoch(3)):
            np.testing.assert_array_equal(ea, eb)
        # different epochs differ
        a2 = list(TrainPatchSource(out, batch_size=4, seed=7, num_workers=1).epoch(4))
        b2 = list(TrainPatchSource(out, batch_size=4, seed=7, num_workers=1).epoch(3))
        assert any(not np.array_equal(x, y) for x, y in zip(a2, b2))

    def test_epoch_chunks_matches_epoch(self, tmp_path, rng):
        """Chunk-native gathers (epoch_chunks — the producer-thread fast
        path the drivers use) must yield bit-identical batch composition
        to epoch() + chunked_batches: the deterministic-resume contract."""
        from srgan_st_tpu.train.utils import chunked_batches, iter_chunks

        pack = tmp_path / "patches.pack.npy"
        np.save(pack, rng.integers(0, 256, (44, 8, 8, 3), np.uint8))
        a = PackedPatchSource(str(pack), batch_size=4, seed=3)
        b = PackedPatchSource(str(pack), batch_size=4, seed=3)
        # 11 batches, chunk 4 -> chunks of 4/4/3 (partial final chunk)
        ref = list(chunked_batches(a.epoch(5), 4))
        fast = list(b.epoch_chunks(5, 4))
        assert [c.shape for c in fast] == [c.shape for c in ref]
        for x, y in zip(fast, ref):
            np.testing.assert_array_equal(x, y)
        # iter_chunks dispatches to the fast path and applies put
        c = PackedPatchSource(str(pack), batch_size=4, seed=3)
        tagged = list(iter_chunks(c, 5, 4, put=lambda ch: ("put", ch)))
        assert all(t[0] == "put" for t in tagged)
        np.testing.assert_array_equal(tagged[0][1], ref[0])

    def test_abandoned_epoch_unblocks_producer(self, tmp_path, rng):
        """Abandoning an epoch iterator mid-stream (close / exception)
        must let the producer thread exit instead of leaving it blocked
        forever in q.put on a full prefetch queue (leaking the thread and
        the chunk buffers it holds)."""
        import threading
        import time

        pack = tmp_path / "patches.pack.npy"
        np.save(pack, rng.integers(0, 256, (64, 8, 8, 3), np.uint8))

        def assert_threads_drain(make_iter):
            before = threading.active_count()
            it = make_iter()
            next(it)  # producer alive, prefetch queue full behind us
            it.close()
            deadline = time.monotonic() + 5.0
            while threading.active_count() > before:
                if time.monotonic() > deadline:
                    raise AssertionError(
                        f"producer thread leaked: {threading.active_count()} "
                        f"threads alive vs {before} before"
                    )
                time.sleep(0.05)

        src = PackedPatchSource(str(pack), batch_size=4, seed=0, prefetch=1)
        assert_threads_drain(lambda: src.epoch(0))
        assert_threads_drain(lambda: src.epoch_chunks(0, 2))

    def test_iter_chunks_custom_put_with_device_cache(self, tmp_path, rng):
        """A caller-supplied host-side `put` must be honored even when the
        source has device_cache on: the on-device gather path never
        materializes a host chunk, so iter_chunks must take the host path
        instead of silently dropping the transform."""
        from srgan_st_tpu.parallel.mesh import make_mesh
        from srgan_st_tpu.train.utils import iter_chunks

        pack = tmp_path / "patches.pack.npy"
        np.save(pack, rng.integers(0, 256, (44, 8, 8, 3), np.uint8))
        src = PackedPatchSource(str(pack), batch_size=8, seed=3,
                                device_cache=True)
        assert src.device_cache
        tagged = list(iter_chunks(src, 5, 2, put=lambda ch: ("put", ch),
                                  mesh=make_mesh()))
        assert all(t[0] == "put" for t in tagged)
        assert isinstance(tagged[0][1], np.ndarray)

    def test_epoch_chunks_device_matches_host(self, tmp_path, rng):
        """HBM-resident gathers (epoch_chunks_device) must yield the exact
        batch composition of the host path — device_cache changes WHERE the
        gather runs, never WHAT the step sees."""
        from srgan_st_tpu.parallel.mesh import make_mesh
        from srgan_st_tpu.train.utils import chunked_batches, iter_chunks

        pack = tmp_path / "patches.pack.npy"
        # batch 8 over the 8-device mesh -> 1 per device; 44 rows -> 5
        # batches, chunk 2 -> chunks of 2/2/1 (partial final chunk)
        np.save(pack, rng.integers(0, 256, (44, 8, 8, 3), np.uint8))
        host = PackedPatchSource(str(pack), batch_size=8, seed=3,
                                 device_cache=False)
        dev = PackedPatchSource(str(pack), batch_size=8, seed=3,
                                device_cache=True)
        assert dev.device_cache and not host.device_cache
        mesh = make_mesh()
        ref = list(chunked_batches(host.epoch(5), 2))
        fast = list(iter_chunks(dev, 5, 2, mesh=mesh))
        assert [tuple(c.shape) for c in fast] == [c.shape for c in ref]
        for x, y in zip(fast, ref):
            np.testing.assert_array_equal(np.asarray(x), y)

    def test_device_cache_auto_gate(self, tmp_path, rng):
        """auto resolves by pack size vs budget."""
        pack = tmp_path / "patches.pack.npy"
        np.save(pack, rng.integers(0, 256, (16, 8, 8, 3), np.uint8))
        small = PackedPatchSource(str(pack), batch_size=4,
                                  device_cache="auto",
                                  device_cache_budget=1 << 20)
        big = PackedPatchSource(str(pack), batch_size=4,
                                device_cache="auto", device_cache_budget=64)
        assert small.device_cache and not big.device_cache

    def test_batch_order_is_the_raw_permutation(self, tmp_path, rng):
        """Batches must arrive in (seed, epoch)-permutation order, NOT
        index-sorted: contiguous process/device shares of a sorted batch
        are index-correlated (a pack stores same-image tiles contiguously),
        which would bias per-shard BN statistics under TPU.LOCAL_BN."""
        pack_arr = rng.integers(0, 256, (32, 8, 8, 3), np.uint8)
        pack = tmp_path / "patches.pack.npy"
        np.save(pack, pack_arr)
        src = PackedPatchSource(str(pack), batch_size=8, seed=3)
        order = np.random.default_rng((3, 0)).permutation(32)
        for b, batch in enumerate(src.epoch(0)):
            np.testing.assert_array_equal(
                batch, pack_arr[order[b * 8:(b + 1) * 8]]
            )

    def test_smaller_than_one_batch_fails_fast(self, tmp_path, rng):
        """A dataset below the global batch size would yield ZERO batches
        (drop_last) and the training loop would silently no-op; the
        constructor must reject it instead."""
        import pytest

        pack = tmp_path / "patches.pack.npy"
        np.save(pack, rng.integers(0, 256, (4, 8, 8, 3), np.uint8))
        with pytest.raises(ValueError, match="smaller than one global batch"):
            PackedPatchSource(str(pack), batch_size=8)
        d = str(tmp_path / "imgs")
        _write_images(d, n=2, h=96, w=96, rng=rng)
        with pytest.raises(ValueError, match="smaller than one global batch"):
            TrainPatchSource(d, batch_size=4, num_workers=1)

    def test_synthetic_deterministic(self):
        a = list(SyntheticPatchSource(2, 16, n_batches=3, seed=1).epoch())
        b = list(SyntheticPatchSource(2, 16, n_batches=3, seed=1).epoch())
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
