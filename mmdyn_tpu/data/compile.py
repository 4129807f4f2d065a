"""Host-side dataset compile: simulator PNG/JSON dumps -> packed .npz.

Replicates the math of the reference compile
(mmdyn/pytorch/utils/datasets.py:159-312) exactly, then goes one step further
than its pickle-of-PIL-lists: frames are baked to the final 64x64 uint8
training resolution at compile time (the reference re-resizes 256->64 every
epoch in __getitem__, datasets.py:114-157 — a pure waste since both resizes
are deterministic). The packed arrays stream straight to HBM with no per-epoch
host image work.

Replicated reference behaviours (each gated by ``strict_parity``):
* the LAST sequence of the glob order is never emitted (the reference only
  flushes a sequence when the next one starts, datasets.py:210-224, and never
  flushes after the loop);
* the 'sv' dataset variant appends each sequence seq_length//5 times — the
  reference's copy loop (datasets.py:213-220) mutates no elements, so its net
  effect is plain duplication;
* quaternion min/max forced to [-1, 1] (datasets.py:203-204);
* min-max normalisation with NaN->0 for degenerate ranges (datasets.py:407-408);
* seg pixels equal to 1 zeroed after crop+resize (datasets.py:240);
* availability flags from per-channel std of the 256x256 crops
  (datasets.py:247-249);
* sequences shuffled once at compile (datasets.py:259-262); the 80/20
  train/test split later drops the final element (datasets.py:107-108).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from mmdyn_tpu.config import COMPILE_SIZE, IMAGE_SIZE

COMPILED_NAME = "compiled_dataset_v2.npz"
# --no-crop variant (crop=False): same pipeline minus the seg-bbox re-crop.
# The reference's object-centred crop (datasets.py:347-366) destroys world
# x/y observability — the object lands in the middle of every frame — which
# is why its models can never beat a mean predictor on x/y (see
# docs/PARITY.md "Accuracy at reference scale"). Distinct file name so the
# two variants never collide in one dataset dir.
NOCROP_NAME = "compiled_dataset_v2_nocrop.npz"


def compiled_name_for(crop=True):
    return COMPILED_NAME if crop else NOCROP_NAME


def _minmax_normalize(x, lo, hi):
    """(x - lo) / (hi - lo), NaN -> 0 (datasets.py:407-408)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.nan_to_num((x - lo) / (hi - lo), nan=0.0)


def _bounding_box(img):
    """Square-expanded bbox of the max-valued seg region (datasets.py:347-366)."""
    mask = np.where(img == np.max(img))
    ymin, ymax = np.min(mask[0]), np.max(mask[0])
    xmin, xmax = np.min(mask[1]), np.max(mask[1])
    height = ymax - ymin
    width = xmax - xmin
    diff = height - width
    if diff > 0:
        xmin = max(0, xmin - diff / 2)
        xmax = min(img.shape[1], xmax + diff / 2)
    elif diff < 0:
        ymin = max(0, ymin - abs(diff) / 2)
        ymax = min(img.shape[0], ymax + abs(diff) / 2)
    return xmin, ymin, xmax, ymax


def _load_image(img_path, bounding_box=None, resize=True):
    """PIL load + crop + 256x256 resize + 3-channel cast (datasets.py:318-345)."""
    from PIL import Image

    img = Image.open(img_path)
    if bounding_box is not None:
        img = img.crop(bounding_box)
    if resize:
        img = img.resize((COMPILE_SIZE, COMPILE_SIZE))
    np_img = np.array(img).copy()
    if np_img.ndim == 2:
        np_img = np.repeat(np_img[:, :, np.newaxis], 3, axis=2).astype(np.uint8)
    img.close()
    return np_img


def _to_train_res(np_img):
    """256x256 -> 64x64 bilinear, the train-time torchvision Resize
    (datasets.py:23-26 uses PIL-backed bilinear)."""
    from PIL import Image

    img = Image.fromarray(np_img[:, :, :3])
    img = img.resize((IMAGE_SIZE, IMAGE_SIZE), Image.BILINEAR)
    return np.array(img, dtype=np.uint8)


def compile_dataset(dataset_path, strict_parity=True, seed=None,
                    compiled_name=COMPILED_NAME, verbose=True, engine="auto",
                    crop=True):
    """Compile ``<dataset_path>/dataset/**`` dumps into a packed npz.

    ``engine``: 'pil' (reference-exact Python path), 'native' (the C++ ingest
    library — OpenMP-parallel PNG decode + crop + resample, ~identical output
    within uint8 rounding), or 'auto' (native when it builds, else PIL).

    ``crop=False`` (the --no-crop CLI flag) skips the reference's seg-bbox
    re-crop on every stream, keeping the camera frame intact so world x/y
    stays observable. Beyond-parity; write it under ``NOCROP_NAME``.

    Returns the path of the written npz.
    """
    root = Path(dataset_path).expanduser()
    dump_root = root / "dataset"
    tactile_images = sorted(dump_root.glob("**/tactile_*.png"))
    visual_images = sorted(dump_root.glob("**/visual_*.png"))
    seg_images = sorted(dump_root.glob("**/seg_*.png"))
    data_files = sorted(dump_root.glob("**/data.json"))
    assert data_files, f"no data.json under {dump_root}"
    # the reference derives seq_length as a global ratio (datasets.py:176) and
    # silently misaligns frames if any sequence has a different count (e.g. a
    # partially-written dump or two runs writing the same logdir). Fail loudly
    # instead: every sequence directory must hold the same number of frames.
    counts = {}
    for img in visual_images:
        counts[img.parent] = counts.get(img.parent, 0) + 1
    # a run killed between writing visual_NNNN.png and the matching tactile_/
    # seg_ frame misaligns the streams even with uniform visual counts, so the
    # per-directory tactile and seg counts must equal the visual count too
    tac_counts, seg_counts = {}, {}
    for img in tactile_images:
        tac_counts[img.parent] = tac_counts.get(img.parent, 0) + 1
    for img in seg_images:
        seg_counts[img.parent] = seg_counts.get(img.parent, 0) + 1
    uniform = len(set(counts.values())) <= 1
    streams_match = tac_counts == counts and seg_counts == counts
    data_dirs = {d.parent for d in data_files}
    if not uniform or not streams_match or set(counts) != data_dirs:
        from collections import Counter
        hist = Counter(counts.values())
        mode = hist.most_common(1)[0][0] if hist else 0
        bad = sorted(str(d) for d, c in counts.items() if c != mode)[:8]
        ragged = sorted(str(d) for d in counts
                        if tac_counts.get(d, 0) != counts[d]
                        or seg_counts.get(d, 0) != counts[d])[:8]
        # symmetric difference: dirs with frames but no data.json AND dirs
        # with data.json but no frames both point at the culprit
        unpaired = sorted(str(d) for d in
                          set(counts).symmetric_difference(data_dirs))[:8]
        raise ValueError(
            f"non-uniform dump under {dump_root}: visual frame counts "
            f"{dict(hist)} (expected every sequence to have {mode}); "
            f"offending dirs: {bad or ragged or unpaired} "
            f"(ragged tactile/seg streams: {ragged}; "
            f"frame/data.json mismatches: {unpaired}) — was the directory "
            "written by more than one run, or a run killed mid-sequence?")
    seq_length = int(len(visual_images) / len(data_files))
    suffix = str(seq_length - 1).zfill(4)
    final_visual_images = sorted(dump_root.glob(f"**/visual_{suffix}.png"))
    final_tactile_images = sorted(dump_root.glob(f"**/tactile_{suffix}.png"))
    final_seg_images = sorted(dump_root.glob(f"**/seg_{suffix}.png"))

    if verbose:
        print(f"Visual images: {len(visual_images)}, Tactile images: "
              f"{len(tactile_images)}, Sequences: {len(data_files)}, "
              f"Sequence length: {seq_length}")

    # pose / shock min-max over the whole corpus (datasets.py:187-204)
    pose_list, shock_list = [], []
    infos = []
    for d in data_files:
        with open(d) as f:
            info = json.load(f)
        infos.append(info)
        pose_list.append(np.concatenate(
            (np.asarray(info["position"]), np.asarray(info["orientation"])), axis=1))
        if "shock" in info:
            shock_list.append(np.asarray(info["shock"], dtype=np.float64).reshape(len(info["shock"]), -1))
        else:
            shock_list.append(np.zeros((1, 1)))
    pose_all = np.concatenate(pose_list, axis=0)
    shock_all = np.concatenate(shock_list, axis=0)
    pose_min, pose_max = pose_all.min(axis=0), pose_all.max(axis=0)
    shock_min, shock_max = shock_all.min(axis=0), shock_all.max(axis=0)
    pose_min[3:] = -1.0
    pose_max[3:] = 1.0
    has_shock = any("shock" in info for info in infos)
    if has_shock and not all("shock" in info for info in infos):
        missing = [str(data_files[i]) for i, info in enumerate(infos)
                   if "shock" not in info][:5]
        raise ValueError(
            "mixed corpus: some sequences have 'shock' and some do not "
            f"(e.g. {missing}); compile shock and no-shock experiments into "
            "separate datasets")
    shock_dim = shock_all.shape[1]

    sv = "sv" in str(dataset_path)

    if engine == "auto":
        from mmdyn_tpu.data import native
        use_native = native.available()
    elif engine == "native":
        from mmdyn_tpu.data import native
        assert native.available(), "native ingest library failed to build"
        use_native = True
    else:
        use_native = False

    # the reference only flushes a sequence when the next one begins, so the
    # final sequence of the glob order is never emitted (datasets.py:210-224)
    n_total = len(data_files)
    n_emit = (n_total - 1) if strict_parity else n_total

    seqs = {k: [] for k in ("visual", "tactile", "pose", "avail", "shock",
                            "seg", "final_visual", "final_tactile", "final_pose")}

    def compile_sequence_pil(frame_slice):
        vis, tac, seg, avail = [], [], [], []
        for vis_p, tac_p, seg_p in zip(visual_images[frame_slice],
                                       tactile_images[frame_slice],
                                       seg_images[frame_slice]):
            if crop:
                seg_np_original = _load_image(seg_p, resize=False)
                bbox = _bounding_box(seg_np_original)
            else:
                bbox = None
            seg_np = _load_image(seg_p, bounding_box=bbox)
            seg_np = np.where(seg_np == 1, 0, seg_np)
            visual_np = _load_image(vis_p, bounding_box=bbox)
            tactile_np = _load_image(tac_p, bounding_box=bbox)
            avail.append(np.array([
                float(np.std(visual_np, axis=(0, 1)).any()),
                float(np.std(tactile_np, axis=(0, 1)).any())], np.float32))
            vis.append(_to_train_res(visual_np))
            tac.append(_to_train_res(tactile_np))
            seg.append(_to_train_res(seg_np.astype(np.uint8)))
        return (np.stack(vis), np.stack(tac), np.stack(seg), np.stack(avail))

    def compile_final_pil(s):
        if crop:
            final_seg_np = _load_image(final_seg_images[s], resize=False)
            bbox = _bounding_box(final_seg_np)
        else:
            bbox = None
        return (_to_train_res(_load_image(final_visual_images[s],
                                          bounding_box=bbox)),
                _to_train_res(_load_image(final_tactile_images[s],
                                          bounding_box=bbox)))

    for s in range(n_emit):
        info = infos[s]
        frame_slice = slice(s * seq_length, (s + 1) * seq_length)
        if use_native:
            from mmdyn_tpu.data import native
            vis64, tac64, seg64, avail = native.compile_frames(
                seg_images[frame_slice], visual_images[frame_slice],
                tactile_images[frame_slice], crop=crop)
            fvis, ftac = native.compile_final(
                final_seg_images[s], final_visual_images[s],
                final_tactile_images[s], crop=crop)
        else:
            vis64, tac64, seg64, avail = compile_sequence_pil(frame_slice)
            fvis, ftac = compile_final_pil(s)

        pose = np.concatenate((np.asarray(info["position"]),
                               np.asarray(info["orientation"])), axis=1)
        pose = _minmax_normalize(pose, pose_min, pose_max).astype(np.float32)
        final_pose = _minmax_normalize(
            np.concatenate((info["position"][-1], info["orientation"][-1])),
            pose_min, pose_max).astype(np.float32)
        if has_shock:
            shock = np.asarray(info.get("shock", np.zeros((seq_length, 1))),
                               dtype=np.float64).reshape(seq_length, -1)
            shock = _minmax_normalize(shock, shock_min, shock_max).astype(np.float32)
        else:
            shock = np.zeros((seq_length, shock_dim), np.float32)

        reps = (seq_length // 5) if sv else 1  # datasets.py:213-220 net effect
        for _ in range(reps):
            seqs["visual"].append(vis64)
            seqs["tactile"].append(tac64)
            seqs["seg"].append(seg64)
            seqs["avail"].append(avail)
            seqs["pose"].append(pose)
            seqs["shock"].append(shock)
            seqs["final_visual"].append(fvis)
            seqs["final_tactile"].append(ftac)
            seqs["final_pose"].append(final_pose)

    n = len(seqs["visual"])
    if verbose:
        print(f"Compiled {n} sequences"
              + (" (last sequence dropped — reference parity)" if strict_parity else ""))

    # shuffle once (datasets.py:259-262)
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)

    packed = {
        "visual": np.stack([seqs["visual"][j] for j in order]),
        "tactile": np.stack([seqs["tactile"][j] for j in order]),
        "pose": np.stack([seqs["pose"][j] for j in order]),
        "avail": np.stack([seqs["avail"][j] for j in order]),
        "seg": np.stack([seqs["seg"][j] for j in order]),
        "final_visual": np.stack([seqs["final_visual"][j] for j in order]),
        "final_tactile": np.stack([seqs["final_tactile"][j] for j in order]),
        "final_pose": np.stack([seqs["final_pose"][j] for j in order]),
        "seq_length": np.int64(seq_length),
        "has_shock": np.bool_(has_shock),
        "crop": np.bool_(crop),
        # min-max normalisation constants (datasets.py:187-204) — the
        # reference recomputes and discards these at compile; recording them
        # makes runs self-describing so serving can denormalise pose/shock
        "pose_min": pose_min.astype(np.float32),
        "pose_max": pose_max.astype(np.float32),
    }
    if has_shock:
        packed["shock"] = np.stack([seqs["shock"][j] for j in order])
        packed["shock_min"] = shock_min.astype(np.float32)
        packed["shock_max"] = shock_max.astype(np.float32)

    out = root / compiled_name
    if str(compiled_name).endswith(".npz"):
        np.savez_compressed(out, **packed)
    else:
        save_packed_dir(out, packed)
    return out


def save_packed_dir(out_dir, packed):
    """Write the packed arrays as one raw .npy per key (memmap-friendly: big
    corpora stream from disk instead of living in host RAM). Writes to a temp
    sibling and atomically replaces the target, so interrupted compiles never
    leave partial datasets and recompiles never leave stale keys behind."""
    import shutil

    out_dir = Path(out_dir)
    tmp_dir = out_dir.with_name(out_dir.name + ".tmp")
    if tmp_dir.exists():
        shutil.rmtree(tmp_dir)
    tmp_dir.mkdir(parents=True)
    for k, v in packed.items():
        np.save(tmp_dir / f"{k}.npy", np.asarray(v))
    if out_dir.exists():
        shutil.rmtree(out_dir)
    tmp_dir.rename(out_dir)
    return out_dir


def load_packed(path, mmap=True):
    """Load a compiled dataset: an .npz file (in-RAM) or a packed directory
    of .npy files (memmapped when ``mmap``). Returns a dict of arrays."""
    path = Path(path)
    if path.is_dir():
        out = {}
        for f in sorted(path.glob("*.npy")):
            out[f.stem] = np.load(f, mmap_mode="r" if mmap else None)
        return out
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def _color_mask(img_path, crop_size):
    """HSV-threshold object mask for real STS captures (datasets.py:368-377)."""
    import cv2

    x, y, w, h = crop_size
    img = cv2.imread(str(img_path))[y:y + h, x:x + w]
    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
    lower = np.array([0, 50, 50])
    upper = np.array([150, 255, 255])
    return cv2.bitwise_not(cv2.inRange(hsv, lower, upper))


def _load_real_image(img_path, mask=None, crop_size=None):
    """Real-capture load: optional colour-mask + grey fill, 256 resize
    (datasets.py:318-345 real branch)."""
    import cv2
    from PIL import Image

    if mask is None:
        img = Image.open(img_path)
    else:
        assert crop_size is not None
        x, y, w, h = crop_size
        img = cv2.imread(str(img_path))[y:y + h, x:x + w]
        img = cv2.bitwise_and(img, img, mask=mask)
        img[mask == 0] = [210] * 3
        img = Image.fromarray(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
    img = img.resize((COMPILE_SIZE, COMPILE_SIZE))
    np_img = np.array(img).copy()
    if np_img.ndim == 2:
        np_img = np.repeat(np_img[:, :, np.newaxis], 3, axis=2).astype(np.uint8)
    img.close()
    return np_img


def compile_real_dataset(dataset_path, seed=None, compiled_name=COMPILED_NAME,
                         verbose=True, crop_size=(40, 10, 330, 290)):
    """Compile REAL sensor captures (datasets.py:269-312): per-trial
    visual/tactile initial+final pairs with colour-mask segmentation of the
    final frames. Sequence length is 2 (initial -> final)."""
    root = Path(dataset_path).expanduser()
    dump_root = root / "dataset"
    initial_visual = sorted(dump_root.glob("**/visual/initial.png"))
    initial_tactile = sorted(dump_root.glob("**/tactile/initial.png"))
    final_visual = sorted(dump_root.glob("**/visual/final.png"))
    final_tactile = sorted(dump_root.glob("**/tactile/final.png"))
    assert initial_visual, f"no real captures under {dump_root}"
    seq_length = 2

    if verbose:
        print(f"Visual images: {len(initial_visual) * seq_length}, Tactile "
              f"images: {len(initial_tactile) * seq_length}, Sequences: "
              f"{len(initial_visual)}, Sequence length: {seq_length}")

    vis_seqs, tac_seqs, fv_list, ft_list = [], [], [], []
    for i in range(len(initial_visual)):
        mask = _color_mask(final_visual[i], crop_size)
        vis = _to_train_res(_load_real_image(initial_visual[i]))
        tac = _to_train_res(_load_real_image(initial_tactile[i]))
        fv = _to_train_res(_load_real_image(final_visual[i], mask=mask,
                                            crop_size=crop_size))
        ft = _to_train_res(_load_real_image(final_tactile[i], mask=mask,
                                            crop_size=crop_size))
        # the real branch stores single-frame sequences (datasets.py:301-302)
        vis_seqs.append(np.stack([vis]))
        tac_seqs.append(np.stack([tac]))
        fv_list.append(fv)
        ft_list.append(ft)

    n = len(vis_seqs)
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)
    t = vis_seqs[0].shape[0]
    packed = {
        "visual": np.stack([vis_seqs[j] for j in order]),
        "tactile": np.stack([tac_seqs[j] for j in order]),
        "pose": np.zeros((n, t, 7), np.float32),
        "avail": np.ones((n, t, 2), np.float32),
        "seg": np.full((n, t, IMAGE_SIZE, IMAGE_SIZE, 3), 255, np.uint8),
        "final_visual": np.stack([fv_list[j] for j in order]),
        "final_tactile": np.stack([ft_list[j] for j in order]),
        "final_pose": np.zeros((n, 7), np.float32),
        "seq_length": np.int64(t),
        "has_shock": np.bool_(False),
    }
    out = root / compiled_name
    np.savez_compressed(out, **packed)
    if verbose:
        print(f"Compiled {n} real sequences")
    return out
