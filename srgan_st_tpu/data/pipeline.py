"""Host input pipeline.

The reference's train loader reads one 96x96 HR patch per item and runs the
MATLAB bicubic degradation *per sample on the CPU in a single DataLoader
worker* (reference dataset.py:9-35, train.py:32-40) — its documented input
bottleneck (SURVEY.md §2.4). The TPU-native split is:

  host:   decode pre-tiled uint8 HR patches with a thread pool, assemble
          global batches, prefetch (uint8 over PCIe — 4x cheaper than f32)
  device: /255 normalize, optional augmentation, bicubic x(1/upscale)
          degradation — fused into the jitted train step (see
          srgan_st_tpu/train/steps.py), bit-matching the reference's
          Bicubic.forward including its round(255x)/255 quantization.

Shuffling is a numpy permutation per epoch (reference uses
DataLoader(shuffle=True) with drop_last=True — matched).
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from PIL import Image

from srgan_st_tpu.parallel.distributed import process_slice


_IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff", ".webp")


class _DeferredProcessSlice:
    """Lazily-resolved `process_slice` for a data source.

    Resolving jax.process_count() initializes the jax backend, so the
    lookup must NOT happen at source construction: a source built before
    `initialize_distributed()` would latch process_count=1 and the later
    distributed init would fail. Resolved (and cached) at first batch,
    by which point the drivers have already initialized the runtime."""

    def __init__(self, global_batch_size: int, process_index=None,
                 process_count=None):
        self._args = (global_batch_size, process_index, process_count)
        self._slice: slice | None = None

    def get(self) -> slice:
        if self._slice is None:
            self._slice = process_slice(*self._args)
        return self._slice


def _list_images(directory: str) -> list[str]:
    out = []
    for dirpath, _, filenames in os.walk(directory):
        for f in sorted(filenames):
            if f.lower().endswith(_IMG_EXTS) and not f.startswith("."):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


def _decode_rgb(path: str) -> np.ndarray:
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def _put_or_stop(q: queue.Queue, item, stop: threading.Event) -> bool:
    """Blocking q.put that gives up once `stop` is set. A plain q.put
    would block forever on a full queue after the consumer abandoned the
    generator (close()/exception mid-epoch): the producer only re-checks
    `stop` at the loop top, so the finally-block's stop.set() could never
    unblock it, leaking the thread and the chunk buffers it holds."""
    while not stop.is_set():
        try:
            q.put(item, timeout=0.2)
            return True
        except queue.Full:
            continue
    return False


def _prefetched(n_items: int, make_item, prefetch: int):
    """Generator yielding ``make_item(0..n_items-1)`` built on a background
    thread through a bounded queue.

    One implementation of the producer/sentinel/exception/shutdown
    protocol for every source: item construction (decode, mmap gather,
    optional device transfer) overlaps the consumer's dispatch loop;
    exceptions propagate to the consumer; abandoning the generator stops
    the producer promptly (`_put_or_stop`) instead of leaking the thread."""
    q: queue.Queue = queue.Queue(maxsize=max(1, prefetch))
    stop = threading.Event()

    def producer():
        try:
            for i in range(n_items):
                if stop.is_set():
                    return
                if not _put_or_stop(q, make_item(i), stop):
                    return
            _put_or_stop(q, None, stop)
        except Exception as e:  # propagate decode/IO errors to the consumer
            _put_or_stop(q, e, stop)

    threading.Thread(target=producer, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, Exception):
                raise item
            yield item
    finally:
        stop.set()


def _locality_gather(pack: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Fancy-index `idx` rows out of the (mmap'd) pack with page-sequential
    reads, PRESERVING the caller's row order.

    Gathering in sorted order keeps cold-mmap page faults sequential; the
    scatter-back restores the random order. Returning the batch sorted
    (one copy cheaper) is NOT an option: contiguous process/device shares
    of a sorted batch are index-correlated (a pack stores same-image tiles
    contiguously), which silently biases per-shard BN statistics under
    TPU.LOCAL_BN — shard composition must stay as random as the
    permutation that produced it."""
    flat = idx.reshape(-1)
    order = np.argsort(flat, kind="stable")
    gathered = pack[flat[order]]
    out = np.empty_like(gathered)
    out[order] = gathered
    return out.reshape(*idx.shape, *pack.shape[1:])


class TrainPatchSource:
    """Streams shuffled uint8 NHWC GT-patch batches from a directory of
    pre-tiled HR patches (the output of prepare_dataset.py)."""

    def __init__(self, gt_dir: str, batch_size: int, patch_size: int = 96,
                 seed: int = 0, num_workers: int = 4, prefetch: int = 2,
                 process_index: int | None = None,
                 process_count: int | None = None):
        self.files = _list_images(gt_dir)
        if not self.files:
            raise FileNotFoundError(f"no images under {gt_dir}")
        if len(self.files) < batch_size:
            # drop_last semantics would yield ZERO batches per epoch and
            # the training loop would silently no-op through every epoch
            raise ValueError(
                f"dataset smaller than one global batch: {len(self.files)} "
                f"patches under {gt_dir} < batch_size {batch_size}"
            )
        self.batch_size = batch_size  # GLOBAL batch size
        # multi-host: each process decodes only its slice of every batch
        self._pslice = _DeferredProcessSlice(batch_size, process_index,
                                             process_count)
        self.patch_size = patch_size
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self._epoch_counter = 0
        self._pool = (
            ThreadPoolExecutor(max_workers=self.num_workers)
            if self.num_workers > 1
            else None
        )

    def __len__(self) -> int:  # batches per epoch (drop_last=True)
        return len(self.files) // self.batch_size

    def _load_batch(self, paths: list[str]) -> np.ndarray:
        if self._pool is not None:
            ims = list(self._pool.map(_decode_rgb, paths))
        else:
            ims = [_decode_rgb(p) for p in paths]
        s = self.patch_size
        out = np.empty((len(ims), s, s, 3), dtype=np.uint8)
        for i, im in enumerate(ims):
            if im.shape[0] < s or im.shape[1] < s:
                raise ValueError(f"patch smaller than {s}: {paths[i]} {im.shape}")
            out[i] = im[:s, :s]
        return out

    def epoch(self, epoch_idx: int | None = None):
        """Yield uint8 (B, S, S, 3) batches for one shuffled epoch, with a
        background prefetch pipeline.

        The shuffle is keyed by (seed, epoch_idx) so a resumed run replays
        the exact data order of the original run from any epoch boundary
        (deterministic-resume; the reference's global-seed scheme can't do
        this, SURVEY.md §5)."""
        if epoch_idx is None:
            epoch_idx = self._epoch_counter
        self._epoch_counter = epoch_idx + 1
        order = np.random.default_rng((self.seed, epoch_idx)).permutation(len(self.files))

        def make_batch(b: int) -> np.ndarray:
            idx = order[b * self.batch_size:(b + 1) * self.batch_size]
            idx = idx[self._pslice.get()]  # this process's share
            return self._load_batch([self.files[i] for i in idx])

        yield from _prefetched(len(self), make_batch, self.prefetch)


class SyntheticPatchSource:
    """Deterministic synthetic GT patches (tests / benchmarks; no disk IO)."""

    def __init__(self, batch_size: int, patch_size: int = 96, n_batches: int = 64,
                 seed: int = 0, process_index: int | None = None,
                 process_count: int | None = None, **_unused):
        self.batch_size = batch_size
        self.patch_size = patch_size
        self.n_batches = n_batches
        self._rng = np.random.default_rng(seed)
        self._pslice = _DeferredProcessSlice(batch_size, process_index,
                                             process_count)

    def __len__(self) -> int:
        return self.n_batches

    def epoch(self, epoch_idx: int | None = None):
        del epoch_idx  # synthetic data: every epoch is freshly drawn
        for _ in range(self.n_batches):
            # draw the full GLOBAL batch so data is process-count-invariant,
            # then keep this process's slice
            batch = self._rng.integers(
                0, 256, (self.batch_size, self.patch_size, self.patch_size, 3),
                dtype=np.uint8,
            )
            yield batch[self._pslice.get()]


class PackedPatchSource:
    """Decode-free training source over a packed uint8 patch archive
    (`patches.pack.npy`, produced by prepare_dataset --pack).

    The pack is a memory-mapped (N, S, S, 3) uint8 array; a batch read is a
    gather-memcpy with zero image decoding — the host stays ahead of the
    device even at multi-chip global batch sizes, where per-PNG decoding
    (~0.2 ms each) would bottleneck the input pipeline. Batch gathers run
    on a background thread (`prefetch` bounds the queue) so page-faulting
    cold mmap pages overlaps device compute instead of serializing with
    the dispatch loop."""

    def __init__(self, pack_path: str, batch_size: int, seed: int = 0,
                 prefetch: int = 2, process_index: int | None = None,
                 process_count: int | None = None,
                 device_cache: bool | str = "auto",
                 device_cache_budget: int = 4 << 30, **_unused):
        self.pack = np.load(pack_path, mmap_mode="r")
        if self.pack.ndim != 4 or self.pack.dtype != np.uint8:
            raise ValueError(f"not a patch pack: {pack_path} {self.pack.shape}")
        if self.pack.shape[0] < batch_size:
            # drop_last semantics would yield ZERO batches per epoch and
            # the training loop would silently no-op through every epoch
            raise ValueError(
                f"pack smaller than one global batch: {self.pack.shape[0]} "
                f"patches in {pack_path} < batch_size {batch_size}"
            )
        self.batch_size = batch_size
        self.patch_size = int(self.pack.shape[1])
        self.seed = seed
        self.prefetch = prefetch
        self._epoch_counter = 0
        self._pslice = _DeferredProcessSlice(batch_size, process_index,
                                             process_count)
        if device_cache == "auto":
            device_cache = self.pack.nbytes <= device_cache_budget
        self.device_cache = bool(device_cache)
        self._device_state = None  # (mesh, resident pack, jitted gather)

    def __len__(self) -> int:
        return self.pack.shape[0] // self.batch_size

    def _epoch_order(self, epoch_idx: int | None) -> tuple[np.ndarray, int]:
        if epoch_idx is None:
            epoch_idx = self._epoch_counter
        self._epoch_counter = epoch_idx + 1
        order = np.random.default_rng((self.seed, epoch_idx)).permutation(
            self.pack.shape[0]
        )
        return order, len(self)

    def epoch(self, epoch_idx: int | None = None):
        order, n_batches = self._epoch_order(epoch_idx)

        def make_batch(b: int) -> np.ndarray:
            idx = order[b * self.batch_size:(b + 1) * self.batch_size]
            return _locality_gather(self.pack, idx[self._pslice.get()])

        yield from _prefetched(n_batches, make_batch, self.prefetch)

    def epoch_chunks(self, epoch_idx: int | None, chunk_size: int, put=None):
        """Chunk-native epoch: yield (K, B, S, S, 3) stacked chunks built
        as ONE fancy-index gather each, on the prefetch thread.

        Why not `chunked_batches(epoch())`: stacking K per-batch yields on
        the CONSUMER thread put ~180 ms/chunk (K=100) of memcpy on the
        dispatch loop's critical path — measured as the difference between
        1,336 and ~5,000 patches/s in the e2e disk->device bench. Here the
        whole chunk is gathered (and optionally `put` = transferred to
        device) inside the producer thread, so the consumer only dequeues
        device-ready chunks.

        Batch composition is IDENTICAL to epoch() + chunking: batch b is
        order[b*B:(b+1)*B] of the (seed, epoch)-keyed permutation in
        permutation order (gathers run page-sequentially internally, see
        `_locality_gather`), each process keeping its contiguous share —
        deterministic-resume parity is pinned by
        test_data.py::test_epoch_chunks_matches_epoch."""
        order, n_batches = self._epoch_order(epoch_idx)
        n_chunks = -(-n_batches // chunk_size)

        def make_chunk(ci: int):
            start = ci * chunk_size
            k = min(chunk_size, n_batches - start)
            idx = order[start * self.batch_size:
                        (start + k) * self.batch_size]
            idx = idx.reshape(k, self.batch_size)[:, self._pslice.get()]
            chunk = _locality_gather(self.pack, idx)
            return put(chunk) if put is not None else chunk

        yield from _prefetched(n_chunks, make_chunk, self.prefetch)

    def _resident(self, mesh):
        """Stage the whole pack in HBM (replicated over `mesh`) and build
        the jitted on-device batch gather. Cached per mesh."""
        if self._device_state is not None and self._device_state[0] is mesh:
            return self._device_state[1], self._device_state[2]
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        replicated = NamedSharding(mesh, P())
        pack = np.ascontiguousarray(self.pack)
        if jax.process_count() > 1:
            # replicated sharding: every device's shard is the full array,
            # so process-local data is the full (identical) pack
            dev_pack = jax.make_array_from_process_local_data(
                replicated, pack, pack.shape
            )
        else:
            dev_pack = jax.device_put(pack, replicated)
        batch_sharding = NamedSharding(mesh, P(None, "data"))

        def gather(pack_, idx):
            flat = jnp.take(pack_, idx.reshape(-1), axis=0)
            return flat.reshape(*idx.shape, *pack_.shape[1:])

        gather_jit = jax.jit(
            gather,
            in_shardings=(replicated, batch_sharding),
            out_shardings=batch_sharding,
        )
        self._device_state = (mesh, dev_pack, gather_jit)
        return dev_pack, gather_jit

    def epoch_chunks_device(self, epoch_idx: int | None, chunk_size: int,
                            mesh):
        """HBM-resident epoch: the pack lives on the devices (staged once,
        replicated — it is read-only training data) and each (K, B, S, S, 3)
        chunk is gathered ON DEVICE from a (K, B) int32 index array, so the
        host ships ~8 bytes/patch instead of ~27 KB/patch.

        Why this is the TPU-native default: a packed SISR training set is
        small next to HBM (DIV2K tiled at 96^2 is ~3.6 GB vs 16 GB on v5e),
        while the host->device link is the one resource the input pipeline
        cannot buy back with threads — on this environment's tunneled chip
        it streams unique data at ~50 MB/s, capping streamed training at
        ~1.7k patches/s no matter how far ahead the host runs. Resident
        gathers move the per-chunk transfer from 44 MB to 6 KB and run the
        (1600, 96, 96, 3) uint8 take at HBM bandwidth (~0.1 ms).

        Batch composition is bit-identical to epoch()/epoch_chunks (same
        (seed, epoch)-keyed permutation in permutation order, per-process
        contiguous share) — pinned by
        test_data.py::test_epoch_chunks_device_matches_host. No index sort
        anywhere: the HBM take is order-insensitive, and random order is
        load-bearing — contiguous device shards of a sorted batch would be
        index-correlated, biasing per-shard BN stats under TPU.LOCAL_BN."""
        from srgan_st_tpu.parallel.mesh import shard_chunk

        order, n_batches = self._epoch_order(epoch_idx)
        dev_pack, gather_jit = self._resident(mesh)
        for start in range(0, n_batches, chunk_size):
            k = min(chunk_size, n_batches - start)
            idx = order[start * self.batch_size:
                        (start + k) * self.batch_size]
            idx = idx.reshape(k, self.batch_size)
            idx = idx[:, self._pslice.get()].astype(np.int32)
            yield gather_jit(dev_pack, shard_chunk(idx, mesh))


def make_train_source(config):
    # tiles may be larger than GT_IMAGE_SIZE — the train step then takes
    # per-sample random GT_IMAGE_SIZE^2 crops on device (train/steps.py)
    tile = config.DATA.TILE_SIZE or config.DATA.GT_IMAGE_SIZE
    if config.DATA.SYNTHETIC:
        return SyntheticPatchSource(
            config.DATA.BATCH_SIZE, tile,
            n_batches=config.DATA.SYNTHETIC_N_BATCHES, seed=config.DATA.SEED,
        )
    gt_dir = config.DATA.TRAIN_GT_IMAGES_DIR
    pack = (
        gt_dir if gt_dir.endswith(".npy")
        else os.path.join(gt_dir, "patches.pack.npy")
    )
    if os.path.exists(pack):
        return PackedPatchSource(
            pack, config.DATA.BATCH_SIZE,
            seed=config.DATA.SEED, prefetch=config.DATA.PREFETCH,
            device_cache=config.DATA.DEVICE_CACHE,
            device_cache_budget=config.DATA.DEVICE_CACHE_BUDGET,
        )
    return TrainPatchSource(
        gt_dir,
        config.DATA.BATCH_SIZE,
        tile,
        seed=config.DATA.SEED,
        num_workers=config.DATA.NUM_WORKERS,
        prefetch=config.DATA.PREFETCH,
    )


class TestPairSource:
    """Paired pre-generated GT/LR eval directories, sorted filename
    alignment (reference dataset.py:39-58; e.g. GTmod12 / LRbicx4)."""

    def __init__(self, gt_dir: str, lr_dir: str):
        self.gt_files = _list_images(gt_dir)
        self.lr_files = _list_images(lr_dir)
        if len(self.gt_files) != len(self.lr_files):
            raise ValueError(
                f"GT/LR count mismatch: {len(self.gt_files)} vs {len(self.lr_files)}"
            )

    def __len__(self) -> int:
        return len(self.gt_files)

    def __iter__(self):
        for gt_path, lr_path in zip(self.gt_files, self.lr_files):
            gt = _decode_rgb(gt_path).astype(np.float32) / 255.0
            lr = _decode_rgb(lr_path).astype(np.float32) / 255.0
            yield gt[None], lr[None]  # NHWC batch-1
