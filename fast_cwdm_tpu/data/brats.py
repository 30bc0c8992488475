"""BraTS / LIDC host-side datasets (parity surface for
`/root/reference/guided_diffusion/bratsloader.py` and `lidcloader.py`).

Preprocessing matches the reference exactly (`bratsloader.py:40-109`):
quantile clip (0.001/0.999) → min-max to [0,1] → zero-pad Z 155→160 → crop
X,Y 240→224 (``[8:-8, 8:-8]``). Output layout is channels-last
``(224, 224, 160, 1)`` (the reference emits ``(1, 224, 224, 160)``).

Missing-modality detection returns ``missing`` + a zero placeholder
(`bratsloader.py:51-53`); modes train/eval/auto change ``subj`` bookkeeping
(`bratsloader.py:85-91`).
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np

from fast_cwdm_tpu.data import nifti

SEQTYPES = ("t1n", "t1c", "t2w", "t2f", "seg")
MODALITIES = ("t1n", "t1c", "t2w", "t2f")

RAW_SHAPE = (240, 240, 155)
PADDED_Z = 160
CROP = 8  # 240 → 224 on X and Y


def clip_and_normalize(img: np.ndarray) -> np.ndarray:
    """(`bratsloader.py:105-109`)"""
    img_clipped = np.clip(
        img, np.quantile(img, 0.001), np.quantile(img, 0.999)
    )
    lo, hi = np.min(img_clipped), np.max(img_clipped)
    if hi == lo:  # constant (e.g. blank) volume: zeros, matching the
        return np.zeros_like(img_clipped)  # native C++ path — not NaNs
    return (img_clipped - lo) / (hi - lo)


def pad_crop(vol: np.ndarray) -> np.ndarray:
    """Pad Z to 160 → crop X,Y by 8 → (X',Y',Z',1) f32 (geometry part of
    `bratsloader.py:48-50`)."""
    out = np.zeros((vol.shape[0], vol.shape[1], PADDED_Z), dtype=np.float32)
    out[:, :, : vol.shape[2]] = vol
    out = out[CROP:-CROP, CROP:-CROP, :]
    return out[..., None]


def preprocess_volume(vol: np.ndarray) -> np.ndarray:
    """clip/normalize → pad Z to 160 → crop X,Y to 224 → (X,Y,Z,1) f32."""
    return pad_crop(clip_and_normalize(vol))


def load_seg(path: str) -> np.ndarray:
    """Raw BraTS labels pad/cropped to the training geometry, uint8 —
    labels are categorical, so `clip_and_normalize` must NOT run (the
    reference never loads seg into training; the lesion-weighted loss
    option does). uint8 keeps a device-pinned seg at 8 MB/case instead
    of 32 (the f32 pin tipped the production HBM budget over — the
    remat-all + device-cache pairing runs near the 16 GB edge by
    design, PERF.md round 3)."""
    # rint, not truncation: a seg NIfTI with scl_slope/inter can surface
    # 3.0 as 3.9999…; truncating .astype would silently corrupt labels
    return np.rint(
        pad_crop(np.asarray(nifti.load(path).get_fdata(), np.float32))
    ).astype(np.uint8)


def load_preprocessed(path: str) -> np.ndarray:
    """Load + preprocess one modality volume.

    Uses the native C++ decode + fused clip/normalize
    (``data/native/fastnifti.cpp``) when available — the ctypes call
    releases the GIL so `ThreadedLoader` decodes cases on all cores —
    falling back to the pure-Python reader."""
    if os.environ.get("FAST_CWDM_NATIVE", "1") != "0":
        from fast_cwdm_tpu.data import native

        res = native.load_volume(path)
        if res is not None:
            vol, _ = res
            if native.clip_and_normalize_inplace(vol) is not None:
                return pad_crop(vol)
    return preprocess_volume(nifti.load(path).get_fdata())


def unprocess_volume(vol: np.ndarray, raw_shape=None) -> np.ndarray:
    """Invert pad/crop: (224,224,Z[,1]) → (240,240,155) with zeros in the
    cropped border (`complete_dataset.py:321-367`'s un-crop).

    ``raw_shape`` defaults to the BraTS geometry inferred from ``vol``
    (X+16, Y+16, min(Z, 155)); pass the source NIfTI shape explicitly when
    available.
    """
    vol = np.asarray(vol)
    if vol.ndim == 4:
        vol = vol[..., 0]
    if raw_shape is None:
        raw_shape = (
            vol.shape[0] + 2 * CROP,
            vol.shape[1] + 2 * CROP,
            min(vol.shape[2], RAW_SHAPE[2]),
        )
    out = np.zeros(raw_shape, dtype=vol.dtype)
    out[CROP:-CROP, CROP:-CROP, :] = vol[:, :, : raw_shape[2]]
    return out


def parse_seqtype(filename: str) -> str | None:
    """Filename → modality: ``BraTS-GLI-00000-000-t1n.nii.gz`` → ``t1n``
    (`bratsloader.py:36`)."""
    parts = filename.split("-")
    if len(parts) < 5:
        return None
    seq = parts[4].split(".")[0]
    return seq if seq in SEQTYPES else None


class BRATSVolumes:
    """Leaf-directory dataset (`bratsloader.py:9-102`).

    ``cache=True`` memoizes preprocessed modality arrays by path (read-only
    views; collation copies). For small datasets this removes the per-epoch
    gzip-decode cost entirely — on a 1-core host the decode otherwise
    starves the chip (measured: 6.4 s/step data wait vs 0.21 s/step compute
    on the 24-case phantom run). ~32 MB per modality volume; a 24-case
    4-modality set caches in ~3.1 GB.
    """

    def __init__(
        self, directory: str, mode: str = "train", gen_type=None,
        cache: bool = False, with_seg: bool = False,
    ):
        self.mode = mode
        self.directory = os.path.expanduser(directory)
        self.gentype = gen_type
        self.with_seg = with_seg
        self._cache: dict[str, np.ndarray] | None = {} if cache else None
        self.database: list[dict[str, str]] = []
        for root, dirs, files in sorted(os.walk(self.directory, followlinks=True)):
            if not dirs:
                datapoint = {}
                for f in sorted(files):
                    seqtype = parse_seqtype(f)
                    if seqtype:
                        datapoint[seqtype] = os.path.join(root, f)
                if datapoint:
                    self.database.append(datapoint)

    def __len__(self) -> int:
        return len(self.database)

    def _load_cached(self, path: str, loader=None) -> np.ndarray:
        # late-bound default: module-level load_preprocessed is resolved at
        # call time so tests (and users) can monkeypatch the decode seam
        if loader is None:
            loader = load_preprocessed
        if self._cache is None:
            return loader(path)
        vol = self._cache.get(path)
        if vol is None:
            vol = loader(path)
            # read-only: every consumer (collation, jnp.asarray) copies;
            # dict set is GIL-atomic so concurrent loader threads at worst
            # decode the same path twice, never corrupt
            vol.setflags(write=False)
            self._cache[path] = vol
        return vol

    def __getitem__(self, idx: int) -> dict:
        filedict = self.database[idx]
        missing = "none"
        out: dict = {}
        for m in MODALITIES:
            if m in filedict:
                out[m] = self._load_cached(filedict[m])
            else:
                missing = m
                out[m] = np.zeros((1,), dtype=np.float32)
        if self.with_seg:
            segp = filedict.get("seg")
            if segp:
                out["seg"] = self._load_cached(segp, loader=load_seg)
            else:
                # a seg-less case trains with an empty mask (the aux loss
                # term contributes zero) rather than failing collation
                ref = next(
                    (out[m] for m in MODALITIES if out[m].ndim == 4), None
                )
                shape = ref.shape if ref is not None else (
                    240 - 2 * CROP, 240 - 2 * CROP, PADDED_Z, 1
                )
                out["seg"] = np.zeros(shape, dtype=np.uint8)
        if self.mode in ("eval", "auto"):
            subj = filedict.get("t1n", filedict.get("t2f", "dummy_string"))
        else:
            subj = "dummy_string"
        out["missing"] = missing
        out["subj"] = subj
        out["filedict"] = filedict
        return out


class LIDCVolumes:
    """LIDC 256³ CT volumes, optional 2× average-pool to 128³
    (`lidcloader.py:9-54`); unconditional path."""

    def __init__(self, directory: str, mode: str = "train", half_res: bool = True):
        self.mode = mode
        self.half_res = half_res
        self.directory = os.path.expanduser(directory)
        self.database: list[str] = []
        for root, dirs, files in sorted(os.walk(self.directory)):
            if not dirs:
                for f in sorted(files):
                    if f.endswith((".nii", ".nii.gz")):
                        self.database.append(os.path.join(root, f))

    def __len__(self) -> int:
        return len(self.database)

    def __getitem__(self, idx: int) -> np.ndarray:
        vol = nifti.load(self.database[idx]).get_fdata()
        vol = clip_and_normalize(vol).astype(np.float32)
        if self.half_res:
            s = vol.shape
            vol = vol.reshape(
                s[0] // 2, 2, s[1] // 2, 2, s[2] // 2, 2
            ).mean(axis=(1, 3, 5))
        return vol[..., None]


def iterate_batches(
    dataset,
    batch_size: int,
    *,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = True,
    keys=MODALITIES,
    num_workers: int = 0,
    rows: tuple[int, int] | None = None,
) -> Iterator[dict[str, np.ndarray]]:
    """Collate dict items into stacked numpy batches (modality keys only).

    ``num_workers > 0`` decodes items on a thread pool (the reference's
    DataLoader runs 12 worker processes, `train.py:66-69`) — the yielded
    batch sequence is identical to the serial path for any worker count.

    ``rows=(start, stop)`` is the multi-host contract
    (`parallel.mesh.local_batch_rows`): every process builds the same
    seeded permutation, but this one decodes and yields only rows
    ``[start, stop)`` of each ``batch_size``-row global batch — the only
    rows its devices own, so nothing else is ever read from disk.
    """
    from fast_cwdm_tpu.data.loader import iter_items, shard_order_rows

    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    if rows is not None:
        if not drop_last:
            # a ragged global tail cannot shard evenly across processes
            # (some would own rows that don't exist and stall the
            # collective batch assembly)
            raise ValueError("rows= requires drop_last=True")
        order, batch_size = shard_order_rows(order, batch_size, rows)
    def collate(batch: list[dict]) -> dict[str, np.ndarray]:
        # an incomplete case yields a (1,)-shaped zero placeholder for its
        # missing modality (`bratsloader.py:51-53`); stacking that with
        # real volumes would die with an opaque shape error, so name the
        # offending case/modality instead (the reference's DataLoader
        # crashes the same way, uninformatively).
        for b in batch:
            if b.get("missing", "none") in keys:
                where = b.get("filedict") or b.get("subj") or "?"
                raise ValueError(
                    f"case is missing modality {b['missing']!r} but the "
                    f"batch collates keys {tuple(keys)} — use mode='auto' "
                    f"pipelines (which read 'missing' per case) or drop "
                    f"the incomplete case; offending case files: {where}"
                )
        return {k: np.stack([b[k] for b in batch]) for k in keys}

    items = iter_items(dataset, order, num_workers)
    batch: list[dict] = []
    for item in items:
        batch.append(item)
        if len(batch) == batch_size:
            yield collate(batch)
            batch = []
    if batch and not drop_last:
        yield collate(batch)
