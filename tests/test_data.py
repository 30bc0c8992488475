"""Data-layer tests (L0): NIfTI IO, BraTS dataset semantics, prefetcher."""

import gzip
import os

import numpy as np
import pytest

from fast_cwdm_tpu.data import (
    BRATSVolumes,
    Nifti1Image,
    ThreadedLoader,
    clip_and_normalize,
    iterate_batches,
    load,
    parse_seqtype,
    prefetch_to_device,
    preprocess_volume,
    save,
    unprocess_volume,
)


class TestNifti:
    @pytest.mark.parametrize("ext", [".nii", ".nii.gz"])
    def test_roundtrip(self, tmp_path, ext):
        rng = np.random.default_rng(0)
        data = rng.random((7, 5, 3)).astype(np.float32)
        affine = np.array(
            [[-1, 0, 0, 100], [0, 2, 0, -50], [0, 0, 1.5, 7], [0, 0, 0, 1]],
            dtype=np.float64,
        )
        p = str(tmp_path / f"x{ext}")
        save(Nifti1Image(data, affine), p)
        img = load(p)
        np.testing.assert_allclose(img.get_fdata(), data, rtol=1e-6)
        np.testing.assert_allclose(img.affine, affine, atol=1e-5)

    def test_fortran_order_layout(self, tmp_path):
        """NIfTI data is Fortran-ordered on disk; the first axis must vary
        fastest."""
        data = np.arange(24, dtype=np.float32).reshape(4, 3, 2)
        p = str(tmp_path / "f.nii")
        save(Nifti1Image(data, np.eye(4)), p)
        raw = open(p, "rb").read()
        voxels = np.frombuffer(raw[352:], dtype="<f4")
        np.testing.assert_array_equal(
            voxels[:4], data[:, 0, 0].astype(np.float32)
        )

    def test_int16_dtype(self, tmp_path):
        data = np.arange(-5, 7, dtype=np.int16).reshape(3, 4)
        p = str(tmp_path / "i.nii.gz")
        save(Nifti1Image(data, np.eye(4)), p)
        img = load(p)
        assert img.dataobj.dtype == np.int16
        np.testing.assert_array_equal(img.get_fdata(), data.astype(np.float64))

    def test_rejects_garbage(self, tmp_path):
        p = str(tmp_path / "bad.nii")
        with open(p, "wb") as f:
            f.write(b"\x00" * 400)
        with pytest.raises(ValueError):
            load(p)


def _make_case(case_dir, modalities, shape=(24, 24, 15)):
    os.makedirs(case_dir, exist_ok=True)
    rng = np.random.default_rng(hash(case_dir) % 2**32)
    base = os.path.basename(case_dir)
    for m in modalities:
        vol = (rng.random(shape) * 1000).astype(np.float32)
        save(
            Nifti1Image(vol, np.eye(4)),
            os.path.join(case_dir, f"BraTS-GLI-{base}-000-{m}.nii.gz"),
        )


class TestBrats:
    def test_parse_seqtype(self):
        assert parse_seqtype("BraTS-GLI-00000-000-t1n.nii.gz") == "t1n"
        assert parse_seqtype("BraTS-GLI-00000-000-seg.nii.gz") == "seg"
        assert parse_seqtype("random.nii.gz") is None

    def test_clip_and_normalize_range(self):
        rng = np.random.default_rng(0)
        img = rng.normal(50, 20, (32, 32, 8))
        out = clip_and_normalize(img)
        assert out.min() == 0.0 and out.max() == 1.0

    def test_preprocess_unprocess_roundtrip(self):
        rng = np.random.default_rng(1)
        vol = rng.random((240, 240, 155))
        pre = preprocess_volume(vol)
        assert pre.shape == (224, 224, 160, 1)
        # Z padding is zero
        assert float(np.abs(pre[:, :, 155:, :]).max()) == 0.0
        un = unprocess_volume(pre)
        assert un.shape == (240, 240, 155)
        np.testing.assert_allclose(
            un[8:-8, 8:-8, :], pre[:, :, :155, 0], atol=0
        )

    def test_dataset_discovery_and_missing(self, tmp_path):
        root = str(tmp_path / "data")
        _make_case(os.path.join(root, "00001"), ["t1n", "t1c", "t2w", "t2f"])
        _make_case(os.path.join(root, "00002"), ["t1n", "t2w", "t2f"])  # t1c missing
        ds = BRATSVolumes(root, mode="train")
        assert len(ds) == 2
        full = ds[0]
        assert full["missing"] == "none"
        for m in ("t1n", "t1c", "t2w", "t2f"):
            assert full[m].shape == (8, 8, 160, 1)  # 24-16 crop, 15→160 pad
        part = ds[1]
        assert part["missing"] == "t1c"
        assert part["t1c"].shape == (1,)

    def test_eval_mode_subj(self, tmp_path):
        root = str(tmp_path / "data")
        _make_case(os.path.join(root, "00001"), ["t1n", "t1c", "t2w", "t2f"])
        ds = BRATSVolumes(root, mode="eval")
        assert ds[0]["subj"].endswith("t1n.nii.gz")

    def test_cache_hits_skip_decode(self, tmp_path, monkeypatch):
        root = str(tmp_path / "data")
        _make_case(os.path.join(root, "00001"), ["t1n", "t1c", "t2w", "t2f"])
        import fast_cwdm_tpu.data.brats as brats_mod

        calls = {"n": 0}
        real = brats_mod.load_preprocessed

        def counting(path):
            calls["n"] += 1
            return real(path)

        monkeypatch.setattr(brats_mod, "load_preprocessed", counting)
        ds = BRATSVolumes(root, mode="train", cache=True)
        first = ds[0]
        assert calls["n"] == 4
        again = ds[0]
        assert calls["n"] == 4  # all four modality decodes memoized
        for m in ("t1n", "t1c", "t2w", "t2f"):
            np.testing.assert_array_equal(first[m], again[m])
            assert not again[m].flags.writeable  # aliased views are read-only
        # default stays uncached (big real datasets must not accumulate RAM)
        ds2 = BRATSVolumes(root, mode="train")
        ds2[0]
        assert calls["n"] == 8


class TestLoader:
    def test_threaded_loader_preserves_order(self):
        class DS:
            def __len__(self):
                return 20

            def __getitem__(self, i):
                return i * 10

        out = list(ThreadedLoader(DS(), num_workers=4))
        assert out == [i * 10 for i in range(20)]

    def test_iterate_batches(self, tmp_path):
        root = str(tmp_path / "data")
        for i in range(3):
            _make_case(
                os.path.join(root, f"0000{i}"), ["t1n", "t1c", "t2w", "t2f"]
            )
        ds = BRATSVolumes(root)
        batches = list(iterate_batches(ds, 2, drop_last=False))
        assert batches[0]["t1n"].shape == (2, 8, 8, 160, 1)
        assert batches[1]["t1n"].shape == (1, 8, 8, 160, 1)

    def test_iterate_batches_names_incomplete_case(self, tmp_path):
        """An incomplete case in a train-mode batch raises an error that
        names the missing modality instead of an opaque np.stack shape
        mismatch (the reference's DataLoader crashes uninformatively)."""
        root = str(tmp_path / "data")
        _make_case(os.path.join(root, "00000"), ["t1n", "t1c", "t2w", "t2f"])
        _make_case(os.path.join(root, "00001"), ["t1n", "t2w", "t2f"])
        ds = BRATSVolumes(root)
        with pytest.raises(ValueError, match="missing modality 't1c'"):
            list(iterate_batches(ds, 2, drop_last=False))

    def test_device_resident_batches_matches_host_path(self, tmp_path):
        """--device_cache must not change the training stream: same
        permutation, same collation, same values as iterate_batches —
        only the residency differs."""
        from fast_cwdm_tpu.data.loader import device_resident_batches

        root = str(tmp_path / "data")
        for i in range(5):
            _make_case(
                os.path.join(root, f"0000{i}"), ["t1n", "t1c", "t2w", "t2f"]
            )
        ds = BRATSVolumes(root)
        cache: dict = {}
        for epoch, bs in ((0, 1), (1, 2)):
            host = list(iterate_batches(ds, bs, shuffle=True, seed=epoch))
            dev = list(
                device_resident_batches(
                    ds, bs, shuffle=True, seed=epoch, cache=cache
                )
            )
            assert len(host) == len(dev)
            for hb, db in zip(host, dev):
                for k in hb:
                    np.testing.assert_array_equal(hb[k], np.asarray(db[k]))
        # every case decoded exactly once: epoch 2 serves pinned arrays
        assert len(cache) == 5
        first = {i: v["t1n"] for i, v in cache.items()}
        list(device_resident_batches(ds, 1, shuffle=True, seed=7, cache=cache))
        for i in cache:
            assert cache[i]["t1n"] is first[i]

    def test_device_resident_batches_names_incomplete_case(self, tmp_path):
        from fast_cwdm_tpu.data.loader import device_resident_batches

        root = str(tmp_path / "data")
        _make_case(os.path.join(root, "00001"), ["t1n", "t2w", "t2f"])
        ds = BRATSVolumes(root)
        with pytest.raises(ValueError, match="missing modality 't1c'"):
            list(device_resident_batches(ds, 1))

    def test_prefetch_to_device(self):
        batches = [{"x": np.full((2, 2), i, np.float32)} for i in range(5)]
        out = list(prefetch_to_device(iter(batches), size=2))
        assert len(out) == 5
        for i, b in enumerate(out):
            np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])

    def test_prefetch_custom_put(self):
        batches = [{"x": np.full((2,), i, np.float32)} for i in range(4)]
        put = lambda b: {k: v + 100 for k, v in b.items()}  # noqa: E731
        out = list(prefetch_to_device(iter(batches), size=2, put=put))
        for i, b in enumerate(out):
            np.testing.assert_array_equal(b["x"], batches[i]["x"] + 100)

    def test_threaded_iterate_batches_matches_serial(self, tmp_path):
        """The training input path (`cli/train.py`): num_workers>0 must
        yield BIT-identical batch sequences to the serial path across
        epoch reshuffles (the per-epoch seed bump)."""
        root = str(tmp_path / "data")
        for i in range(5):
            _make_case(
                os.path.join(root, f"0000{i}"), ["t1n", "t1c", "t2w", "t2f"]
            )
        ds = BRATSVolumes(root)
        for epoch_seed in (7, 8):  # two epochs, different shuffles
            serial = list(
                iterate_batches(ds, 2, shuffle=True, seed=epoch_seed)
            )
            threaded = list(
                iterate_batches(
                    ds, 2, shuffle=True, seed=epoch_seed, num_workers=3
                )
            )
            assert len(serial) == len(threaded) == 2
            for bs, bt in zip(serial, threaded):
                for k in bs:
                    np.testing.assert_array_equal(bs[k], bt[k])

    def test_rows_slice_matches_global_batches(self, tmp_path):
        """Multi-host input contract (`parallel.mesh.local_batch_rows`):
        iterate_batches(rows=(a, b)) must yield exactly rows [a, b) of
        each global batch — same permutation, only the local shard read."""
        root = str(tmp_path / "data")
        for i in range(7):
            _make_case(
                os.path.join(root, f"0000{i}"), ["t1n", "t1c", "t2w", "t2f"]
            )
        ds = BRATSVolumes(root)
        full = list(iterate_batches(ds, 3, shuffle=True, seed=5))
        for a, b in ((0, 1), (1, 3)):
            part = list(
                iterate_batches(ds, 3, shuffle=True, seed=5, rows=(a, b))
            )
            assert len(part) == len(full)
            for bf, bp in zip(full, part):
                for k in bf:
                    np.testing.assert_array_equal(bf[k][a:b], bp[k])
        # ragged tails can't shard across processes
        with pytest.raises(ValueError, match="drop_last"):
            next(iter(iterate_batches(ds, 3, drop_last=False, rows=(0, 1))))


class TestSaveDeterminism:
    def test_gzip_output_reproducible_and_loadable(self, tmp_path):
        """mtime=0 + fixed deflate level → byte-identical re-writes; the
        payload round-trips through our loader."""
        import numpy as np

        from fast_cwdm_tpu.data.nifti import Nifti1Image, load, save

        rng = np.random.default_rng(0)
        vol = rng.random((12, 10, 8)).astype(np.float32)
        p1 = str(tmp_path / "a.nii.gz")
        p2 = str(tmp_path / "b.nii.gz")
        save(Nifti1Image(vol, np.eye(4)), p1)
        save(Nifti1Image(vol, np.eye(4)), p2)
        assert open(p1, "rb").read() == open(p2, "rb").read()
        back = load(p1)
        np.testing.assert_allclose(np.asarray(back.dataobj), vol)


class TestAsyncWriter:
    def test_drain_counts_failures(self):
        from fast_cwdm_tpu.cli.common import AsyncWriter

        w = AsyncWriter()
        done = []
        w.submit("ok", done.append, 1)

        def boom():
            raise RuntimeError("disk full")

        w.submit("bad", boom)
        assert w.drain() == 1
        assert done == [1]


class TestLoaderRobustness:
    def test_worker_exception_surfaces(self):
        """A failing __getitem__ must raise in the consumer, not hang."""
        from fast_cwdm_tpu.data.loader import ThreadedLoader

        class Bad:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                if i == 2:
                    raise OSError("truncated gzip")
                return i

        with pytest.raises(RuntimeError, match="item 2"):
            list(ThreadedLoader(Bad(), num_workers=2))

    def test_bounded_reorder_buffer(self):
        """A slow item 0 must not let the reorder buffer grow past
        max_prefetch."""
        import threading
        import time as _time

        from fast_cwdm_tpu.data.loader import ThreadedLoader

        gate = threading.Event()
        max_seen = {"n": 0}

        class Slow0:
            def __len__(self):
                return 20

            def __getitem__(self, i):
                if i == 0:
                    gate.wait(timeout=5)
                return i

        loader = ThreadedLoader(Slow0(), num_workers=4, max_prefetch=4)
        it = iter(loader)
        # give workers time to run ahead; they can hold at most 4 permits
        _time.sleep(0.3)
        gate.set()
        out = list(it)
        assert out == list(range(20))

    def test_nonpositive_prefetch_clamped(self):
        """max_prefetch<=0 would park every worker before its first item
        and hang the consumer forever — it must clamp to 1, not hang."""
        from fast_cwdm_tpu.data.loader import ThreadedLoader

        class Tiny:
            def __len__(self):
                return 5

            def __getitem__(self, i):
                return i

        assert list(ThreadedLoader(Tiny(), max_prefetch=0)) == list(range(5))

    def test_constant_volume_normalizes_to_zeros(self):
        import numpy as np

        from fast_cwdm_tpu.data.brats import clip_and_normalize

        out = clip_and_normalize(np.full((4, 4, 4), 7.0, np.float32))
        assert np.all(out == 0.0) and np.isfinite(out).all()


def test_load_header_matches_full_load(tmp_path):
    """`nifti.load_header` parses geometry/affine/header identically to a
    full `nifti.load` without decoding the voxel payload (complete_dataset
    and sample_auto take save geometry from it after the native decoder
    already produced the voxels)."""
    from fast_cwdm_tpu.data import Nifti1Image, save
    from fast_cwdm_tpu.data import nifti

    rng = np.random.default_rng(1)
    vol = (rng.random((10, 12, 7)) * 50).astype(np.float32)
    aff = np.array(
        [[-1, 0, 0, 5], [0, 1, 0, -6], [0, 0, 2.0, -3], [0, 0, 0, 1.0]]
    )
    for name in ("x.nii.gz", "x.nii"):
        p = str(tmp_path / name)
        save(Nifti1Image(vol, aff), p)
        full = nifti.load(p)
        hdr = nifti.load_header(p)
        assert hdr.shape == full.shape
        np.testing.assert_allclose(hdr.affine, full.affine, atol=1e-5)
        assert hdr.header.get_data_shape() == full.header.get_data_shape()
