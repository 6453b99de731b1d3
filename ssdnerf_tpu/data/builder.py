"""Dataset registry + data loader.

Replaces /root/reference/lib/datasets/builder.py:14-64 and the split_data
DistributedSampler (samplers/distributed_sampler.py): each process iterates
only its contiguous scene shard (so the rank-local scene cache always owns
the scenes it sees), with epoch shuffling, ``check_batch_disjoint``
protection and background prefetching via a thread.
"""
import queue
import threading

import numpy as np

from .shapenet_srn import ShapeNetSRN

_DATASETS = {'ShapeNetSRN': ShapeNetSRN}


def register_dataset(name, cls):
    _DATASETS[name] = cls


def build_dataset(cfg):
    cfg = dict(cfg)
    kind = cfg.pop('type')
    return _DATASETS[kind](**cfg)


def collate(samples):
    """Stack per-scene dicts into batch arrays; string/path fields become
    lists (the mmcv DataContainer cpu_only analog)."""
    batch = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            batch[key] = np.stack(vals)
        elif isinstance(vals[0], (int, np.integer)):
            batch[key] = np.asarray(vals)
        elif isinstance(vals[0], dict):  # 'code' cache states
            batch[key] = {k: np.stack([v[k] for v in vals])
                          if isinstance(vals[0][k], np.ndarray) else
                          [v[k] for v in vals]
                          for k in vals[0]}
        else:
            batch[key] = vals
    return batch


class DataLoader:
    """Iterates shuffled batches of the rank-local scene shard forever."""

    def __init__(self, dataset, batch_size, rank=0, world_size=1,
                 split_data=True, shuffle=True, seed=0, prefetch=2,
                 check_batch_disjoint=True, strict_disjoint=False,
                 num_workers=0):
        self.dataset = dataset
        self.batch_size = batch_size
        # cfg `workers_per_gpu` lands here: a thread pool decodes the
        # batch's scenes concurrently (cv2's PNG decode releases the GIL,
        # so threads scale like the reference's worker processes without
        # the pickling round-trip).  0 = decode inline on the prefetch
        # thread.
        self.num_workers = int(num_workers)
        self._pool = None
        n = len(dataset)
        if split_data:
            split = np.round(np.linspace(0, n, world_size + 1)).astype(int)
            self.indices = np.arange(split[rank], split[rank + 1])
        else:
            self.indices = np.arange(rank, n, world_size)
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed + rank)
        self.check_batch_disjoint = check_batch_disjoint
        # raise (instead of proceeding) when consecutive batches can't be
        # made scene-disjoint — overlap corrupts per-scene optimizer state
        # when filesystem cache writers are in flight
        # (distributed_sampler.py:72-83 raises likewise)
        self.strict_disjoint = strict_disjoint
        self._skip = 0
        self._queue = queue.Queue(maxsize=prefetch)
        self._thread = None
        self._stop = threading.Event()
        self.iters_per_epoch = max(
            1, int(np.ceil(len(self.indices) / batch_size)))

    def skip_iters(self, n):
        """Fast-forward the batch order by ``n`` iterations without loading
        data — the resume analog of the reference sampler's ``skip_iter``
        (lib/apis/train.py:188-196).  Replays the deterministic shuffle
        sequence, so a resumed run visits exactly the batches an
        uninterrupted run would.  No-op (with a warning) if iteration has
        already started — the loader is then already positioned."""
        if self._thread is not None:
            import warnings
            warnings.warn('DataLoader already iterating; skip_iters ignored')
            return
        self._skip = int(n)

    def _epoch_order(self):
        order = self.indices.copy()
        if self.shuffle:
            self.rng.shuffle(order)
        return order

    def _batches(self):
        """Full batches only; consecutive batches are kept scene-disjoint
        (the reference's check_batch_disjoint stale-optimizer-state guard,
        distributed_sampler.py:72-83) by reshuffling at epoch boundaries."""
        bs = self.batch_size
        prev = set()
        while True:
            order = self._epoch_order()
            if len(order) <= bs:
                if self.strict_disjoint and prev:
                    raise RuntimeError(
                        'cannot keep consecutive batches scene-disjoint: '
                        f'shard of {len(order)} scenes <= batch size {bs} '
                        '(unsafe with filesystem cache writers)')
                prev = set()  # single-batch shard: disjointness impossible
            else:
                for _ in range(20):
                    if not (prev & set(order[:bs].tolist())):
                        break
                    self.rng.shuffle(order)
                else:
                    if self.strict_disjoint:
                        raise RuntimeError(
                            'failed to draw a scene-disjoint consecutive '
                            'batch after 20 reshuffles (unsafe with '
                            'filesystem cache writers)')
            n_full = max(1, len(order) // bs)
            for i in range(n_full):
                batch_ids = order[i * bs:(i + 1) * bs]
                if len(batch_ids) < bs:
                    batch_ids = np.resize(batch_ids, bs)
                prev = set(batch_ids.tolist())
                yield batch_ids

    def _worker(self):
        try:
            skipped = 0
            for batch_ids in self._batches():
                if self._stop.is_set():
                    return
                if skipped < self._skip:
                    skipped += 1
                    continue
                if self.num_workers > 0:
                    if self._pool is None:
                        from concurrent.futures import ThreadPoolExecutor
                        self._pool = ThreadPoolExecutor(
                            max_workers=self.num_workers)
                    samples = list(self._pool.map(
                        self.dataset.__getitem__,
                        [int(i) for i in batch_ids]))
                else:
                    samples = [self.dataset[int(i)] for i in batch_ids]
                self._queue.put(collate(samples))
        except Exception as exc:  # propagate to the consumer thread
            self._queue.put(exc)

    def __iter__(self):
        if self._thread is None:
            self._thread = threading.Thread(target=self._worker, daemon=True)
            self._thread.start()
        while True:
            item = self._queue.get()
            if isinstance(item, Exception):
                raise item
            yield item

    def close(self):
        self._stop.set()
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None
