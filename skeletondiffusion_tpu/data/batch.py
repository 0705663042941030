"""Batching + ON-DEVICE preprocessing: the TPU-native input pipeline.

The reference applies mirroring/rotation/input-space transforms per item in
CPU dataloader workers (`motion_dataset.py:129-192`).  Here the host only
stacks raw numpy segments; ``preprocess_batch`` applies the same
augmentations VECTORIZED on device inside whatever jitted program consumes
the batch — per-item rotation matrices come from a single
``jax.random`` call, so the host (often a single core next to a TPU) never
touches the pose tensors.
"""
from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def preprocess_batch(
    skeleton,
    rng: jax.Array,
    obs: Array,
    pred: Array,
    mm_gt: Optional[Array] = None,
    train: bool = True,
    da_mirroring: float = 0.0,
    da_rotations: float = 0.0,
    if_noisy_obs: bool = False,
    noise_level: float = 0.25,
    noise_std: float = 0.02,
):
    """Jittable: raw metric-space (obs [B,To,J,3], pred [B,Tp,J,3], optional
    mm_gt [B,M,Tp,J,3]) → augmented input-space tensors.

    Augmentation semantics follow reference `motion_dataset.py:129-165`:
    x/y mirroring each with prob ``da_mirroring``, one shared z-rotation of
    an integer degree in [0,360) with prob ``da_rotations`` — identical
    transform applied to obs/pred/mm_gt of the same item.
    """
    B = obs.shape[0]
    k_mx, k_my, k_rotp, k_deg, k_noise, k_nmask = jax.random.split(rng, 6)

    def apply_all(fn, obs, pred, mm_gt):
        obs, pred = fn(obs), fn(pred)
        if mm_gt is not None:
            mm_gt = fn(mm_gt)
        return obs, pred, mm_gt

    if train and da_mirroring > 0:
        for axis, key in ((0, k_mx), (1, k_my)):
            flip = jax.random.uniform(key, (B,)) < da_mirroring
            sign_vec = jnp.where(
                flip[:, None], jnp.ones((B, 3)).at[:, axis].set(-1.0), jnp.ones((B, 3))
            )  # [B,3]

            def mirror(x, sign_vec=sign_vec):
                # broadcast over (time[, mmgt], joints): all dims between B and xyz
                return x * sign_vec.reshape(B, *([1] * (x.ndim - 2)), 3)

            obs, pred, mm_gt = apply_all(mirror, obs, pred, mm_gt)

    if train and da_rotations > 0:
        deg = jax.random.randint(k_deg, (B,), 0, 360).astype(jnp.float32)
        theta = deg * (jnp.pi / 180.0)
        rotate_on = jax.random.uniform(k_rotp, (B,)) < da_rotations
        theta = jnp.where(rotate_on, theta, 0.0)
        c, s = jnp.cos(theta), jnp.sin(theta)
        zeros, ones = jnp.zeros_like(c), jnp.ones_like(c)
        # scipy R.from_euler('z', d).as_matrix()
        rot = jnp.stack(
            [jnp.stack([c, -s, zeros], -1), jnp.stack([s, c, zeros], -1),
             jnp.stack([zeros, zeros, ones], -1)], axis=-2,
        )  # [B,3,3]

        def rotate(x, rot=rot):
            extra = x.ndim - 3
            r = rot.reshape(B, *([1] * extra), 3, 3)
            return jnp.einsum("...ij,...nj->...ni", r, x)

        obs, pred, mm_gt = apply_all(rotate, obs, pred, mm_gt)

    if if_noisy_obs:
        # noise on non-root joints with per-joint mask; reference
        # `motion_dataset.py:11-19,187-188`
        body = obs[..., 1:, :]
        noise = jax.random.normal(k_noise, body.shape) * noise_std
        mask = jax.random.uniform(k_nmask, body.shape[:-1]) < noise_level
        obs = obs.at[..., 1:, :].set(body + noise * mask[..., None])

    To = obs.shape[-3]
    data = jnp.concatenate([obs, pred], axis=-3)
    data = skeleton.tranform_to_input_space(data)
    obs_t, pred_t = data[..., :To, :, :], data[..., To:, :, :]
    if mm_gt is not None:
        mm_gt = skeleton.tranform_to_input_space(mm_gt)
    return obs_t, pred_t, mm_gt


# unique-row granularity of the deduped mm-GT tensor: padding U to a bucket
# multiple keeps the number of distinct XLA program shapes per split small
MM_DEDUP_BUCKET = 128


def collate(batch_items: List[Tuple], max_mmgt: int = 0,
            dedup_mm: bool = False, mm_fetch=None) -> Dict[str, np.ndarray]:
    """Stack raw segments; pad the ragged mm-GT neighbor axis to a fixed
    ``max_mmgt`` (static shapes for jit — replaces the reference's Python
    list collate, `motion_dataset.py:21-29`).

    ``dedup_mm``: emit the mm-GT neighbors DEDUPED across the batch —
    ``mm_gt`` becomes the [U,Tp,J,F] unique futures (U padded to a
    MM_DEDUP_BUCKET multiple) plus an ``mm_idx`` [B,max_mmgt] gather table
    into it.  Neighbor sets of nearby segments overlap heavily on real data,
    so this cuts both the host collate and the host→device bytes by the
    duplication factor; the consumer gathers back to the dense
    [B,M,Tp,J,F] form on device (one HBM-local op) before the metric math.
    Requires items to carry ``mm_gt_idces`` (neighbor segment ids,
    row-aligned with ``mm_gt``).

    ``mm_fetch``: optional ``segment_id -> future [Tp,J,F]`` callable
    (``MotionDataset.future_of_segment``).  With it, the dedup path fills
    each unique row straight from the dataset's clip arrays and the items
    need not carry a dense ``mm_gt`` at all (``MotionDataset.mm_lazy``) —
    skipping the per-item neighbor stacks whose rows the dedup would mostly
    discard."""
    obs = np.stack([b[0] for b in batch_items])
    pred = np.stack([b[1] for b in batch_items])
    out: Dict[str, np.ndarray] = {"obs": obs, "pred": pred}
    extras = [b[2] for b in batch_items]
    lazy_mm = ("mm_gt" not in extras[0] and "mm_gt_idces" in extras[0]
               and dedup_mm and mm_fetch is not None)
    if "mm_gt" in extras[0] or lazy_mm:
        B = len(batch_items)
        Tp, J, F = pred.shape[1:]
        mask = np.zeros((B, max_mmgt), dtype=bool)
        if dedup_mm and "mm_gt_idces" in extras[0]:
            # map: neighbor segment id → (first item holding it, row in that
            # item's mm_gt).  Ordered by first appearance for determinism.
            uniq: Dict[int, Tuple[int, int]] = {}
            for i, e in enumerate(extras):
                for j, seg in enumerate(e["mm_gt_idces"][:max_mmgt]):
                    uniq.setdefault(int(seg), (i, j))
            pos = {seg: p for p, seg in enumerate(uniq)}
            idx = np.zeros((B, max_mmgt), dtype=np.int32)
            for i, e in enumerate(extras):
                rows = e["mm_gt_idces"][:max_mmgt]
                for j, seg in enumerate(rows):
                    idx[i, j] = pos[int(seg)]
                mask[i, : len(rows)] = True
            u = len(uniq)
            u_pad = max(MM_DEDUP_BUCKET, -(-u // MM_DEDUP_BUCKET) * MM_DEDUP_BUCKET)
            mm = np.zeros((u_pad, Tp, J, F), dtype=pred.dtype)
            if lazy_mm:
                for seg in uniq:
                    mm[pos[seg]] = mm_fetch(seg)
            else:
                for seg, (i, j) in uniq.items():
                    mm[pos[seg]] = extras[i]["mm_gt"][j]
            out["mm_gt"] = mm
            out["mm_idx"] = idx
        else:
            mm = np.zeros((B, max_mmgt, Tp, J, F), dtype=pred.dtype)
            for i, e in enumerate(extras):
                m = min(len(e["mm_gt"]), max_mmgt)
                mm[i, :m] = e["mm_gt"][:m]
                mask[i, :m] = True
            out["mm_gt"] = mm
        out["mm_mask"] = mask
    out["segment_idx"] = np.asarray([e["segment_idx"] for e in extras])
    out["metadata"] = [e["metadata"] for e in extras]
    return out


def prefetch_iterator(iterable, prefetch: int = 2, to_device: bool = False):
    """Run the (host-side) batch construction in a background thread so the
    single host core overlaps collate with device compute — the TPU-side
    replacement for the reference's CPU dataloader workers
    (`src/train_utils.py:25-32`).

    ``to_device=True`` additionally ``jax.device_put``s every ndarray value
    of dict items from the producer thread, so the host→device transfer
    (a network RPC on tunneled TPUs — hundreds of MB/batch when ragged
    mm-GT tensors ride along) overlaps the previous batch's compute instead
    of landing inside the consumer's timed loop."""
    import queue
    import threading

    import numpy as _np

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    _END = object()

    def ship(item):
        if not to_device or not isinstance(item, dict):
            return item
        import jax as _jax

        return {
            k: _jax.device_put(v) if isinstance(v, _np.ndarray) else v
            for k, v in item.items()
        }

    stop = threading.Event()

    def put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for item in iterable:
                if not put(ship(item)):
                    return
        except BaseException as e:  # propagate to the consumer — a swallowed
            # producer error would look like a clean (truncated!) epoch end
            put(("__prefetch_error__", e))
            return
        put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, tuple) and len(item) == 2 and item[0] == "__prefetch_error__":
                raise item[1]
            yield item
    finally:
        # consumer stopped early (break / GeneratorExit): halt the producer
        # so it neither draws further dataset-RNG state nor keeps device
        # buffers pinned in the queue
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
        t.join(timeout=5.0)


def bounded_batches(loader, n: Optional[int]):
    """Yield at most ``n`` batches.  Train loops must bound the iterable
    BEFORE ``prefetch_iterator`` rather than breaking out of it — a break
    leaves the producer thread having drawn a timing-dependent number of
    extra dataset-augmentation RNG values, which breaks bit-faithful
    resume."""
    import itertools

    return iter(loader) if n is None else itertools.islice(iter(loader), n)


def cycled_batches(loader, n: Optional[int]):
    """Yield EXACTLY ``n`` batches, restarting the loader when it runs dry —
    ignite's ``epoch_length`` semantics, which the reference's trainers use
    (`src/train.py` passes ``epoch_length=num_iter_perepoch`` and ignite
    cycles the dataloader when the epoch is longer than one pass).  A plain
    truncation (``bounded_batches``) silently shrinks the epoch to one
    loader pass when ``n > len(loader)``, which mis-sizes everything that
    counts in iterations (the AE curriculum cycle ``curriculum_it *
    iter_per_epoch`` most visibly).

    Each restart is a fresh ``DataLoader.__iter__`` pass (re-shuffled; the
    loader's checkpointable RNG advances deterministically), so resume
    stays bit-faithful.  ``n=None`` falls back to one natural pass."""
    if n is None:
        yield from loader
        return
    count = 0
    while count < n:
        empty = True
        for b in loader:
            empty = False
            yield b
            count += 1
            if count >= n:
                return
        if empty:
            raise ValueError("cycled_batches: empty loader")


class DataLoader:
    """Minimal epoch iterator: shuffle, batch, collate, optional pad-to-full
    final batch (static shapes).  Replaces torch DataLoader + workers — with
    device-side preprocessing the host work is just numpy slicing."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        pad_last: bool = False,
        seed: int = 0,
        dedup_mm: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.dedup_mm = dedup_mm
        self._seed = seed
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def state_dict(self) -> Dict:
        """Checkpointable shuffle-RNG + epoch counter so a resumed run
        reproduces an uninterrupted one bit-for-bit (reference checkpoints
        full RNG state, `src/utils/reproducibility.py:47-79`)."""
        return {"rng": self._rng.bit_generator.state, "epoch": self._epoch}

    def load_state_dict(self, state: Dict):
        self._rng.bit_generator.state = state["rng"]
        self._epoch = int(state["epoch"])

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        self._epoch += 1
        max_m = getattr(self.dataset, "max_mmgt_count", 0)
        for start in range(0, n, self.batch_size):
            idx = order[start : start + self.batch_size]
            real_count = len(idx)
            if real_count < self.batch_size:
                if self.drop_last:
                    return
                if self.pad_last:
                    # pad rows come from a dedicated RNG (derived from seed +
                    # epoch, not the shuffle stream) so pad identity cannot
                    # perturb shuffle state across epochs
                    pad_rng = np.random.default_rng((self._seed, self._epoch))
                    pad = pad_rng.choice(order, self.batch_size - real_count)
                    idx = np.concatenate([idx, pad])
            items = [self.dataset[int(i)] for i in idx]
            batch = collate(
                items, max_mmgt=max_m, dedup_mm=self.dedup_mm,
                mm_fetch=(getattr(self.dataset, "future_of_segment", None)
                          if self.dedup_mm else None))
            # number of REAL (non-pad) items: consumers mask accumulator
            # updates on the padded final batch with this
            batch["_count"] = np.asarray(real_count)
            yield batch
