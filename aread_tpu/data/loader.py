"""Data loading, splitting and batching.

Reproduces the reference's L2 data layer (run.py:105-375):
  * column selection per dataset, history-seq parsing with pad id
    ``itemid_all`` and last-``seq_maxlen`` truncation (run.py:105-111);
  * split by timestamp quantiles 0.9/0.95 (amazon) or the ``train_tag``
    column (aliccp/cloudtheme) (run.py:141-144, 180-182);
  * one-hot dims inferred as column max+1 over the full file, with the
    amazon itemid dim pinned to ``itemid_all`` (run.py:154-157);
  * train-frequency domain weights for the weighted mean AUC
    (run.py:294-297, 344-346);
  * domain-grouped batching: one stream per domain, a shuffled
    ``domain_batch_seq`` with ceil(n_d/bs) entries per domain so every
    batch is single-domain (run.py:310-353), plus cyclic per-domain
    iterators with restart (run.py:551-575).

TPU-first: XLA requires static shapes, so every batch is exactly
``batch_size`` rows — ragged final batches are padded and carry a
``valid`` float mask consumed by the loss, metrics and BatchNorm.
"""

from __future__ import annotations

import ast
import dataclasses
import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from aread_tpu import native
from aread_tpu.models.base import FeatureSpec

AMAZON_FEATURES = [
    "itemid", "weekday", "domain", "sales_chart", "sales_rank", "brand", "price",
]
AMAZON_SEQ_FEATURES = ["user_pos_6month_seq", "user_neg_6month_seq"]
ALICCP_FEATURES = [
    "userid", "121", "122", "124", "125", "126", "127", "128", "129", "itemid",
    "domain", "207", "210", "216", "508", "509", "702", "853", "109_14",
    "110_14", "127_14", "150_14", "301",
]
CLOUDTHEME_FEATURES = ["userid", "itemid", "domain", "leaf_cate_id", "cate_level1_id"]


def _parse_seq(seq_str: str, maxlen: int, pad_value: int) -> List[int]:
    seq = ast.literal_eval(seq_str) if isinstance(seq_str, str) else list(seq_str)
    if len(seq) >= maxlen:
        return list(seq[-maxlen:])
    return list(seq) + [pad_value] * (maxlen - len(seq))


@dataclasses.dataclass
class SplitData:
    """Tensorized (numpy) train/valid/test splits plus metadata."""

    train_x: np.ndarray
    train_y: np.ndarray
    valid_x: np.ndarray
    valid_y: np.ndarray
    test_x: np.ndarray
    test_y: np.ndarray
    spec: FeatureSpec
    domain_cnt_weight: np.ndarray
    n_domain: int
    aug_train_x: Optional[np.ndarray] = None
    aug_train_y: Optional[np.ndarray] = None


def dataset_columns(dataset_name: str, history: bool = True, only_id: bool = False):
    if only_id:
        return ["userid", "itemid", "domain"], [], "label" if dataset_name == "amazon" else "click"
    if dataset_name == "amazon":
        return list(AMAZON_FEATURES), (list(AMAZON_SEQ_FEATURES) if history else []), "label"
    if dataset_name == "aliccp":
        return list(ALICCP_FEATURES), [], "click"
    if dataset_name == "cloudtheme":
        return list(CLOUDTHEME_FEATURES), [], "click"
    raise ValueError(f"unknown dataset {dataset_name}")


def tensorize(df: pd.DataFrame, one_hot_cols: Sequence[str], seq_cols: Sequence[str],
              label_col: str, seq_maxlen: int, pad_value: int) -> Tuple[np.ndarray, np.ndarray]:
    """DataFrame -> (X int32 [N, n_onehot + n_seq*maxlen], y int8 [N])
    mirroring save_tensor_from_data (run.py:237-265)."""
    parts = [df[list(one_hot_cols)].to_numpy(dtype=np.int64)]
    for col in seq_cols:
        seqs = df[col].map(lambda s: _parse_seq(s, seq_maxlen, pad_value))
        parts.append(np.stack(seqs.to_numpy()).astype(np.int64))
    x = np.concatenate(parts, axis=1).astype(np.int32)
    y = df[label_col].to_numpy(dtype=np.int8)
    return x, y


def _cache_dir() -> Optional[str]:
    """Parsed-tensor cache location (reference caches parsed tensors to
    ``{mode}_data_loader.pth`` next to the CSV, run.py:260-263; the dataset
    dir here may be read-only, so default to ~/.cache/aread_tpu).
    Set AREAD_TPU_CACHE=0 to disable, or to a directory to relocate."""
    env = os.environ.get("AREAD_TPU_CACHE")
    if env == "0":
        return None
    return env or os.path.join(os.path.expanduser("~"), ".cache", "aread_tpu")


def _read_arrays(path: str, one_hot_cols: Sequence[str], seq_cols: Sequence[str],
                 label_col: str, split_col: str, seq_maxlen: int,
                 pad_value: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(x, y, split) for one CSV: memory-mapped .npy cache when warm
    (keyed on file identity + parse options), else the native C++ parser
    (aread_tpu.native — one multi-threaded pass), pandas otherwise."""
    cache_root = _cache_dir()
    cdir = None
    if cache_root is not None:
        import hashlib
        st = os.stat(path)
        key = hashlib.sha1(repr((os.path.abspath(path), st.st_mtime_ns,
                                 st.st_size, tuple(one_hot_cols),
                                 tuple(seq_cols), label_col, split_col,
                                 seq_maxlen, pad_value)).encode()).hexdigest()
        cdir = os.path.join(cache_root, key)
        if os.path.exists(os.path.join(cdir, "split.npy")):
            # mmap: the arrays are only fancy-indexed downstream (split
            # filters produce copies), so pages load on demand
            return (np.load(os.path.join(cdir, "x.npy"), mmap_mode="r"),
                    np.load(os.path.join(cdir, "y.npy"), mmap_mode="r"),
                    np.load(os.path.join(cdir, "split.npy"), mmap_mode="r"))

    out = None
    if native.available():
        try:
            out = native.load_csv(path, one_hot_cols, seq_cols, label_col,
                                  split_col, seq_maxlen, pad_value)
        except RuntimeError:
            pass  # fall back to pandas (e.g. malformed file)
    if out is None:
        df = pd.read_csv(path, usecols=list(one_hot_cols) + list(seq_cols)
                         + [label_col, split_col])
        x, y = tensorize(df, one_hot_cols, seq_cols, label_col, seq_maxlen,
                         pad_value)
        out = (x, y, df[split_col].to_numpy(dtype=np.float64))

    if cdir is not None:
        try:
            os.makedirs(cdir, exist_ok=True)
            for name, arr in zip(("x", "y", "split"), out):
                tmp = os.path.join(cdir, f".{name}.npy.tmp")
                np.save(tmp, arr)
                os.replace(tmp, os.path.join(cdir, f"{name}.npy"))
        except OSError:
            pass  # cache is best-effort
    return out


def load_split_data(
    path: str,
    dataset_name: str,
    seq_maxlen: int = 5,
    itemid_all: Optional[int] = None,
    aug_path: Optional[str] = None,
    domain_filter: Optional[Sequence[int]] = None,
    history: bool = True,
    only_id: bool = False,
) -> SplitData:
    one_hot_cols, seq_cols, label_col = dataset_columns(dataset_name, history, only_id)
    split_col = "timestamp" if dataset_name == "amazon" else "train_tag"
    n_one = len(one_hot_cols)

    # When no global item vocab is configured the pad id is only known
    # after scanning the data; parse with a -1 sentinel and substitute
    # below (ids are non-negative, so -1 can only mean padding).
    pad0 = int(itemid_all) if itemid_all is not None else -1
    x, y, split = _read_arrays(path, one_hot_cols, seq_cols, label_col,
                               split_col, seq_maxlen, pad0)
    if aug_path is not None:
        aug_x_all, aug_y_all, aug_split = _read_arrays(
            aug_path, one_hot_cols, seq_cols, label_col, split_col,
            seq_maxlen, pad0)
    else:
        aug_x_all = aug_y_all = aug_split = None

    itemid_idx = one_hot_cols.index("itemid")
    domain_idx = one_hot_cols.index("domain")

    if domain_filter is not None:
        keep = np.isin(x[:, domain_idx], list(domain_filter))
        x, y, split = x[keep], y[keep], split[keep]
        if aug_x_all is not None:
            keep = np.isin(aug_x_all[:, domain_idx], list(domain_filter))
            aug_x_all, aug_y_all, aug_split = (
                aug_x_all[keep], aug_y_all[keep], aug_split[keep])

    if dataset_name == "amazon":
        train_valid = np.quantile(split, 0.9)
        valid_test = np.quantile(split, 0.95)
    else:
        train_valid, valid_test = 1, 2

    one_hot_dims = (x[:, :n_one].max(axis=0).astype(np.int64) + 1)
    if aug_x_all is not None:
        # the augmented file is train-time input, so the vocab must cover it
        # too (the reference sizes vocabs from the main file only,
        # run.py:154, and would IndexError on any aug id beyond it — the
        # bundled sample pair actually contains such ids)
        aug_dims = aug_x_all[:, :n_one].max(axis=0).astype(np.int64) + 1
        one_hot_dims = np.maximum(one_hot_dims, aug_dims)
    if dataset_name == "amazon" and itemid_all is not None:
        one_hot_dims[itemid_idx] = itemid_all
    pad_value = int(one_hot_dims[itemid_idx] - 1) if itemid_all is None else int(itemid_all)
    if itemid_all is None and seq_cols:
        # Without a configured global item vocab, reserve one extra row as
        # the sequence pad id (the reference uses config.itemid_all which is
        # itself one past the max item id, config.py:7).
        one_hot_dims[itemid_idx] += 1
        pad_value = int(one_hot_dims[itemid_idx] - 1)
    if pad0 == -1 and seq_cols:
        x[x == -1] = pad_value
        if aug_x_all is not None:
            aug_x_all[aug_x_all == -1] = pad_value

    spec = FeatureSpec(
        one_hot_dims=tuple(int(d) for d in one_hot_dims),
        n_seq_fields=len(seq_cols),
        itemid_idx=itemid_idx,
        domain_idx=domain_idx,
        seq_maxlen=seq_maxlen,
        method="mean",
    )
    n_domain = int(np.unique(x[:, domain_idx]).size)

    tr = split < train_valid
    va = (split >= train_valid) & (split < valid_test)
    te = split >= valid_test
    train_x, train_y = x[tr], y[tr]
    valid_x, valid_y = x[va], y[va]
    test_x, test_y = x[te], y[te]

    domain_vals = train_x[:, domain_idx]
    cnt = np.bincount(domain_vals, minlength=n_domain).astype(np.float64)
    domain_cnt_weight = cnt / max(1, train_x.shape[0])

    aug_x = aug_y = None
    if aug_x_all is not None:
        keep = aug_split < train_valid
        aug_x, aug_y = aug_x_all[keep], aug_y_all[keep]

    return SplitData(
        train_x=train_x, train_y=train_y,
        valid_x=valid_x, valid_y=valid_y,
        test_x=test_x, test_y=test_y,
        spec=spec, domain_cnt_weight=domain_cnt_weight, n_domain=n_domain,
        aug_train_x=aug_x, aug_train_y=aug_y,
    )


def pad_batch(x: np.ndarray, y: np.ndarray, bs: int) -> Dict[str, np.ndarray]:
    """Pad a (possibly ragged) batch to exactly ``bs`` rows with a validity
    mask. Pad rows replicate row 0 so embedding lookups stay in range."""
    n = x.shape[0]
    valid = np.zeros((bs,), dtype=np.float32)
    valid[:n] = 1.0
    if n < bs:
        pad_x = np.broadcast_to(x[:1], (bs - n,) + x.shape[1:])
        pad_y = np.zeros((bs - n,), dtype=y.dtype)
        x = np.concatenate([x, pad_x], axis=0)
        y = np.concatenate([y, pad_y], axis=0)
    return {"x": x, "y": y.astype(np.float32), "valid": valid}


class GlobalBatcher:
    """Shuffled fixed-shape batches over the full split (reference
    convert2data_loader + DataLoader(shuffle=True), run.py:267-308)."""

    def __init__(self, x: np.ndarray, y: np.ndarray, batch_size: int,
                 domain_idx: int, domain2group: Optional[np.ndarray] = None,
                 shuffle: bool = True, seed: int = 0):
        self.x, self.y = x, y
        self.bs = batch_size
        self.domain_idx = domain_idx
        self.domain2group = domain2group
        self.shuffle = shuffle
        self.seed = seed
        # epoch-KEYED shuffling (counter-based Philox on (seed, epoch))
        # rather than a sequential rng stream: an elastic resume can then
        # fast-forward to the saved epoch (set_epoch) and replay the
        # exact permutations the uninterrupted run would have used —
        # bitwise-identical recovery (tests/test_elastic_drill.py).
        self._epoch = 0

    def __len__(self):
        return int(np.ceil(self.x.shape[0] / self.bs))

    def set_epoch(self, epoch: int) -> None:
        """Fast-forward the shuffle stream (elastic resume)."""
        self._epoch = int(epoch)

    def sample_batch(self) -> Dict[str, np.ndarray]:
        """A shape-complete batch that does NOT advance the epoch stream
        (for model init)."""
        sel = np.arange(min(self.bs, self.x.shape[0]))
        batch = pad_batch(self.x[sel], self.y[sel], self.bs)
        domain = batch["x"][:, self.domain_idx].astype(np.int32)
        batch["domain"] = domain
        if self.domain2group is not None:
            batch["group"] = self.domain2group[domain].astype(np.int32)
        return batch

    def epoch_indices(self) -> np.ndarray:
        """One epoch's (shuffled) row order — the same stream __iter__
        consumes, exposed so the device-resident epoch path (trainer
        train_epoch_device) draws identical permutations."""
        idx = np.arange(self.x.shape[0])
        if self.shuffle:
            rng = np.random.Generator(
                np.random.Philox(key=[self.seed & (2**64 - 1),
                                      0xA5EAD ^ self._epoch]))
            rng.shuffle(idx)
        self._epoch += 1
        return idx

    def epoch_perm(self) -> np.ndarray:
        """epoch_indices padded with -1 to whole batches and reshaped to
        [n_batches, bs] — the device-resident scan's batch schedule."""
        idx = self.epoch_indices()
        n_batches = -(-len(idx) // self.bs)
        pad = n_batches * self.bs - len(idx)
        if pad:
            idx = np.concatenate([idx, np.full(pad, -1, idx.dtype)])
        return idx.reshape(n_batches, self.bs).astype(np.int32)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = self.epoch_indices()
        for i in range(0, len(idx), self.bs):
            sel = idx[i:i + self.bs]
            batch = pad_batch(self.x[sel], self.y[sel], self.bs)
            domain = batch["x"][:, self.domain_idx].astype(np.int32)
            batch["domain"] = domain
            if self.domain2group is not None:
                batch["group"] = self.domain2group[domain].astype(np.int32)
            yield batch


class DomainBatcher:
    """Per-domain streams + the shuffled single-domain batch sequence
    (reference convert2domain_data_loader + get_domain_data,
    run.py:310-353, 551-575)."""

    def __init__(self, x: np.ndarray, y: np.ndarray, batch_size: int,
                 domain_idx: int, n_domain: int, shuffle: bool = True, seed: int = 0):
        self.bs = batch_size
        self.domain_idx = domain_idx
        self.n_domain = n_domain
        self.rng = np.random.default_rng(seed)
        domains = x[:, domain_idx]
        self.domain_indices: List[np.ndarray] = [
            np.nonzero(domains == d)[0] for d in range(n_domain)
        ]
        self.x, self.y = x, y
        self.shuffle = shuffle
        self._cursors = [0] * n_domain
        self._orders = [None] * n_domain
        self.domain_batch_seq: List[int] = []
        for d in range(n_domain):
            n_batches = int(np.ceil(len(self.domain_indices[d]) / batch_size))
            self.domain_batch_seq.extend([d] * n_batches)
        self.domain_batch_seq = list(self.rng.permutation(self.domain_batch_seq).astype(int)) \
            if shuffle else self.domain_batch_seq

    def shuffle_seq(self):
        self.domain_batch_seq = list(self.rng.permutation(self.domain_batch_seq).astype(int))

    def next_batch_indices(self, d: int) -> np.ndarray:
        """Row ids of the next batch of domain ``d``, padded to bs with -1
        (the device-resident HEMP path gathers rows by these on device;
        same cursor/permutation stream as next_batch — the two forms are
        interchangeable draws from one stream)."""
        idxs = self.domain_indices[d]
        if len(idxs) == 0:
            raise ValueError(f"domain {d} has no rows")
        if self._orders[d] is None or self._cursors[d] >= len(idxs):
            self._orders[d] = self.rng.permutation(idxs) if self.shuffle else idxs
            self._cursors[d] = 0
        sel = self._orders[d][self._cursors[d]:self._cursors[d] + self.bs]
        self._cursors[d] += self.bs
        out = np.full((self.bs,), -1, np.int32)
        out[:len(sel)] = sel
        return out

    def next_batch(self, d: int) -> Dict[str, np.ndarray]:
        """Cyclic per-domain batch with StopIteration-restart semantics."""
        idx = self.next_batch_indices(d)
        sel = idx[idx >= 0]
        batch = pad_batch(self.x[sel], self.y[sel], self.bs)
        batch["domain"] = np.full((self.bs,), d, dtype=np.int32)
        return batch


def make_synthetic_data(
    n_rows: int = 4096,
    n_domain: int = 5,
    n_one_hot: int = 6,
    n_seq_fields: int = 2,
    seq_maxlen: int = 5,
    vocab: int = 200,
    seed: int = 0,
) -> SplitData:
    """Small random dataset for tests: structured so AUC is learnable
    (label correlates with item embedding parity)."""
    rng = np.random.default_rng(seed)
    dims = [vocab, 8, n_domain, 12, 20, 30][:n_one_hot]
    while len(dims) < n_one_hot:
        dims.append(10)
    itemid_idx, domain_idx = 0, 2
    dims = list(dims)
    cols = [rng.integers(0, d, size=n_rows) for d in dims]
    seq = rng.integers(0, vocab, size=(n_rows, n_seq_fields * seq_maxlen))
    x = np.concatenate([np.stack(cols, axis=1), seq], axis=1).astype(np.int32)
    logits = (x[:, itemid_idx] % 7) / 3.0 - 1.0 + 0.3 * rng.standard_normal(n_rows)
    y = (logits > 0).astype(np.int8)
    # pad id row for sequences
    dims[itemid_idx] = vocab + 1
    spec = FeatureSpec(tuple(dims), n_seq_fields, itemid_idx, domain_idx, seq_maxlen)
    n_train = int(0.8 * n_rows)
    n_valid = int(0.9 * n_rows)
    cnt = np.bincount(x[:n_train, domain_idx], minlength=n_domain).astype(np.float64)
    return SplitData(
        train_x=x[:n_train], train_y=y[:n_train],
        valid_x=x[n_train:n_valid], valid_y=y[n_train:n_valid],
        test_x=x[n_valid:], test_y=y[n_valid:],
        spec=spec, domain_cnt_weight=cnt / n_train, n_domain=n_domain,
    )
