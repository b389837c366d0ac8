"""SR training datasets (upstream basicsr ``data/`` semantics; the
vendored snapshot drops that package but its models consume these
layouts — paired GT/LQ image folders, REDS-style video clip folders —
through FileClient backends).

Host-side: datasets hand numpy HWC float [0,1] arrays to the jitted
train steps; device transfer happens at batch granularity.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..utils.file_client import FileClient, paths_from_meta_info, scandir
from ..utils.image_io import imfrombytes


# ---------------------------------------------------------------------------
# transforms.augment
# ---------------------------------------------------------------------------

def augment(imgs, rng: np.random.Generator, hflip: bool = True,
            rotation: bool = True, flows=None, return_status: bool = False):
    """Random horizontal flip / vertical flip / transpose, each p=0.5
    (basicsr data/transforms.py augment; ``rotation`` enables
    vflip+transpose).  Flow maps get the matching component sign flips
    and dx/dy swap."""
    do_hflip = hflip and rng.random() < 0.5
    do_vflip = rotation and rng.random() < 0.5
    do_rot = rotation and rng.random() < 0.5

    def _aug(img):
        if do_hflip:
            img = img[:, ::-1, :]
        if do_vflip:
            img = img[::-1, :, :]
        if do_rot:
            img = img.transpose(1, 0, 2)
        return np.ascontiguousarray(img)

    def _aug_flow(flow):
        if do_hflip:
            flow = flow[:, ::-1, :].copy()
            flow[:, :, 0] = -flow[:, :, 0]
        if do_vflip:
            flow = flow[::-1, :, :].copy()
            flow[:, :, 1] = -flow[:, :, 1]
        if do_rot:
            flow = flow.transpose(1, 0, 2)
            flow = flow[:, :, [1, 0]]
        return np.ascontiguousarray(flow)

    single = not isinstance(imgs, list)
    out = [_aug(i) for i in ([imgs] if single else imgs)]
    out = out[0] if single else out
    results = [out]
    if flows is not None:
        fsingle = not isinstance(flows, list)
        fout = [_aug_flow(f) for f in ([flows] if fsingle else flows)]
        results.append(fout[0] if fsingle else fout)
    if return_status:
        results.append((do_hflip, do_vflip, do_rot))
    return results[0] if len(results) == 1 else tuple(results)


def paired_random_crop_np(rng: np.random.Generator, gts, lqs,
                          gt_patch: int, scale: int):
    """Aligned random crop on host arrays (data/transforms.py
    paired_random_crop); accepts single images or lists."""
    gsingle = not isinstance(gts, list)
    lsingle = not isinstance(lqs, list)
    gt_list = [gts] if gsingle else gts
    lq_list = [lqs] if lsingle else lqs
    lq_patch = gt_patch // scale
    h_lq, w_lq = lq_list[0].shape[:2]
    if h_lq < lq_patch or w_lq < lq_patch:
        raise ValueError(
            f"LQ ({h_lq}, {w_lq}) is smaller than patch {lq_patch}")
    top = int(rng.integers(0, h_lq - lq_patch + 1))
    left = int(rng.integers(0, w_lq - lq_patch + 1))
    lq_out = [v[top:top + lq_patch, left:left + lq_patch, ...]
              for v in lq_list]
    gt_out = [v[top * scale:top * scale + gt_patch,
                left * scale:left * scale + gt_patch, ...]
              for v in gt_list]
    return (gt_out[0] if gsingle else gt_out,
            lq_out[0] if lsingle else lq_out)


# ---------------------------------------------------------------------------
# path enumeration (data/data_util.py)
# ---------------------------------------------------------------------------

def paired_paths_from_folders(lq_folder: str, gt_folder: str,
                              filename_tmpl: str = "{}"
                              ) -> List[Dict[str, str]]:
    """Pair by GT filename: LQ name = filename_tmpl.format(stem) + ext
    (data_util.paired_paths_from_folders)."""
    gt_names = sorted(scandir(gt_folder))
    paths = []
    for name in gt_names:
        stem, ext = os.path.splitext(os.path.basename(name))
        lq_name = filename_tmpl.format(stem) + ext
        lq_path = os.path.join(lq_folder, lq_name)
        if not os.path.exists(lq_path):
            raise FileNotFoundError(f"{lq_path} is not in lq folder")
        paths.append({"lq_path": lq_path,
                      "gt_path": os.path.join(gt_folder, name)})
    return paths


def paired_paths_from_meta_info_file(lq_folder: str, gt_folder: str,
                                     meta_info_file: str,
                                     filename_tmpl: str = "{}"
                                     ) -> List[Dict[str, str]]:
    """GT names (first token per line) from a meta file
    (data_util.paired_paths_from_meta_info_file)."""
    with open(meta_info_file) as f:
        gt_names = [line.strip().split(" ")[0] for line in f if line.strip()]
    paths = []
    for name in gt_names:
        stem, ext = os.path.splitext(os.path.basename(name))
        lq_name = filename_tmpl.format(stem) + ext
        paths.append({"lq_path": os.path.join(lq_folder, lq_name),
                      "gt_path": os.path.join(gt_folder, name)})
    return paths


# ---------------------------------------------------------------------------
# PairedImageDataset
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PairedImageConfig:
    lq_folder: str
    gt_folder: str
    scale: int = 4
    phase: str = "train"              # train: crop+augment; val: as-is
    gt_size: int = 128
    use_hflip: bool = True
    use_rot: bool = True
    filename_tmpl: str = "{}"
    backend: str = "disk"             # 'disk' | 'packed'
    meta_info_file: Optional[str] = None
    seed: int = 0


class PairedImageDataset:
    """GT/LQ pair dataset (basicsr data/paired_image_dataset.py
    semantics over our FileClient backends)."""

    def __init__(self, cfg: PairedImageConfig):
        self.cfg = cfg
        self.rng = np.random.default_rng(cfg.seed)
        if cfg.backend == "packed":
            self.client = FileClient(
                "packed", db_paths=[cfg.lq_folder, cfg.gt_folder],
                client_keys=["lq", "gt"])
            keys = paths_from_meta_info(cfg.gt_folder)
            self.paths = [{"lq_path": k, "gt_path": k} for k in keys]
        else:
            self.client = FileClient("disk")
            if cfg.meta_info_file:
                self.paths = paired_paths_from_meta_info_file(
                    cfg.lq_folder, cfg.gt_folder, cfg.meta_info_file,
                    cfg.filename_tmpl)
            else:
                self.paths = paired_paths_from_folders(
                    cfg.lq_folder, cfg.gt_folder, cfg.filename_tmpl)

    def __len__(self) -> int:
        return len(self.paths)

    def _read(self, path: str, client_key: str) -> np.ndarray:
        return imfrombytes(self.client.get(path, client_key))

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        rec = self.paths[idx]
        gt = self._read(rec["gt_path"], "gt")
        lq = self._read(rec["lq_path"], "lq")
        if cfg.phase == "train":
            gt, lq = paired_random_crop_np(self.rng, gt, lq, cfg.gt_size,
                                           cfg.scale)
            gt, lq = augment([gt, lq], self.rng, cfg.use_hflip, cfg.use_rot)
        else:
            # val convention: crop GT to match the LQ-reachable area
            h, w = lq.shape[:2]
            gt = gt[:h * cfg.scale, :w * cfg.scale, :]
        return {"lq": lq.astype(np.float32), "gt": gt.astype(np.float32),
                "lq_path": rec["lq_path"], "gt_path": rec["gt_path"]}


# ---------------------------------------------------------------------------
# GT-only dataset (Real-ESRGAN / FFHQ style: LQ is synthesized on the fly)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class GTImageConfig:
    gt_folder: str
    gt_size: int = 256
    phase: str = "train"
    use_hflip: bool = True
    use_rot: bool = True
    seed: int = 0


class GTImageDataset:
    """Ground-truth-only image dataset (basicsr realesrgan_dataset /
    ffhq_dataset semantics: the degradation pipeline synthesizes LQ
    downstream).  Train phase: random gt_size crop (reflect-padded when
    the source is smaller) + flip/rot augmentation."""

    def __init__(self, cfg: GTImageConfig):
        self.cfg = cfg
        self.rng = np.random.default_rng(cfg.seed)
        self.paths = [os.path.join(cfg.gt_folder, p)
                      for p in sorted(scandir(cfg.gt_folder))]
        if not self.paths:
            raise FileNotFoundError(f"no images in {cfg.gt_folder}")

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        gt = imfrombytes(FileClient("disk").get(self.paths[idx]))
        if cfg.phase == "train":
            h, w = gt.shape[:2]
            # cv2 BORDER_REFLECT_101 pads arbitrarily wide; np reflect
            # caps at dim-1 per call, so pad in chunks
            if min(gt.shape[:2]) < 2 and min(gt.shape[:2]) < cfg.gt_size:
                raise ValueError(
                    f"{self.paths[idx]}: {gt.shape[:2]} too small to pad")
            while gt.shape[0] < cfg.gt_size or gt.shape[1] < cfg.gt_size:
                ph = min(max(0, cfg.gt_size - gt.shape[0]),
                         gt.shape[0] - 1)
                pw = min(max(0, cfg.gt_size - gt.shape[1]),
                         gt.shape[1] - 1)
                gt = np.pad(gt, ((0, ph), (0, pw), (0, 0)), mode="reflect")
            h, w = gt.shape[:2]
            top = int(self.rng.integers(0, h - cfg.gt_size + 1))
            left = int(self.rng.integers(0, w - cfg.gt_size + 1))
            gt = gt[top:top + cfg.gt_size, left:left + cfg.gt_size]
            gt = augment(gt, self.rng, cfg.use_hflip, cfg.use_rot)
        return {"gt": gt.astype(np.float32), "gt_path": self.paths[idx]}


# ---------------------------------------------------------------------------
# Video clip dataset (REDS-style folder layout)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class VideoFrameConfig:
    lq_root: str                      # root/<clip>/<frame>.png
    gt_root: str
    num_frame: int = 5
    scale: int = 4
    phase: str = "train"
    gt_size: int = 256
    interval_list: Tuple[int, ...] = (1,)
    random_reverse: bool = False
    use_hflip: bool = True
    use_rot: bool = True
    center_gt: bool = True            # EDVR-style center frame; False: all
    seed: int = 0


class VideoFrameDataset:
    """Sliding-window video samples from clip folders (basicsr
    data/reds_dataset.py REDSDataset / REDSRecurrentDataset semantics:
    per-index a clip + temporal window with random interval, border
    frames padded by clamping; GT = center frame or the full window)."""

    def __init__(self, cfg: VideoFrameConfig):
        self.cfg = cfg
        self.rng = np.random.default_rng(cfg.seed)
        self.client = FileClient("disk")
        self.clips: List[Tuple[str, List[str]]] = []
        for clip in sorted(os.listdir(cfg.gt_root)):
            cdir = os.path.join(cfg.gt_root, clip)
            if not os.path.isdir(cdir):
                continue
            frames = sorted(scandir(cdir))
            if frames:
                self.clips.append((clip, frames))
        if not self.clips:
            raise FileNotFoundError(f"no clip folders in {cfg.gt_root}")
        # one sample per (clip, center frame)
        self.samples = [(ci, fi) for ci, (_c, fr) in enumerate(self.clips)
                        for fi in range(len(fr))]

    def __len__(self) -> int:
        return len(self.samples)

    def _read(self, root: str, clip: str, frame: str) -> np.ndarray:
        return imfrombytes(self.client.get(os.path.join(root, clip, frame)))

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        ci, center = self.samples[idx]
        clip, frames = self.clips[ci]
        n = len(frames)
        interval = int(self.rng.choice(cfg.interval_list)) \
            if cfg.phase == "train" else cfg.interval_list[0]
        half = cfg.num_frame // 2
        idxs = [min(max(center + (o - half) * interval, 0), n - 1)
                for o in range(cfg.num_frame)]
        if cfg.phase == "train" and cfg.random_reverse \
                and self.rng.random() < 0.5:
            idxs = idxs[::-1]
        lqs = [self._read(cfg.lq_root, clip, frames[i]) for i in idxs]
        if cfg.center_gt:
            gts = [self._read(cfg.gt_root, clip, frames[idxs[half]])]
        else:
            gts = [self._read(cfg.gt_root, clip, frames[i]) for i in idxs]
        if cfg.phase == "train":
            gts, lqs = paired_random_crop_np(self.rng, gts, lqs,
                                             cfg.gt_size, cfg.scale)
            both = augment(gts + lqs, self.rng, cfg.use_hflip, cfg.use_rot)
            gts, lqs = both[:len(gts)], both[len(gts):]
        lq = np.stack(lqs).astype(np.float32)
        gt = (gts[0] if cfg.center_gt else np.stack(gts)).astype(np.float32)
        return {"lq": lq, "gt": gt, "key": f"{clip}/{frames[center]}"}


# ---------------------------------------------------------------------------
# batching
# ---------------------------------------------------------------------------

def batch_iterator(dataset, batch_size: int, rng: np.random.Generator,
                   shuffle: bool = True, drop_last: bool = True,
                   keys: Sequence[str] = ("lq", "gt")
                   ) -> Iterator[Dict[str, np.ndarray]]:
    """Epoch iterator stacking dataset dict samples into batches."""
    order = np.arange(len(dataset))
    if shuffle:
        rng.shuffle(order)
    for start in range(0, len(order), batch_size):
        chunk = order[start:start + batch_size]
        if len(chunk) < batch_size and drop_last:
            return
        samples = [dataset[int(i)] for i in chunk]
        yield {k: np.stack([s[k] for s in samples]) for k in keys}
