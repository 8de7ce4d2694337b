"""Measure the PyTorch reference's AREAD train-step throughput on this
container's CPU (the reference targets 'GPU 0 or CPU', config.py:3-4; this
box has no GPU). Imports the reference read-only from /root/reference and
times exactly its hot loop: model(X, mode='domain_mask_bagging') -> mean
per-leaf BCE + reg -> backward -> Adam step (run.py:663-681).

Run:  python benchmarks/reference_baseline.py [--steps 5] [--bs 1024]
Writes the measured examples/s to stdout; paste into BASELINE.md and
bench.py:BASELINE_EXAMPLES_PER_SEC.
"""

import argparse
import sys
import time
import types

sys.path.insert(0, "/root/reference")

import numpy as np
import torch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--bs", type=int, default=1024)
    ap.add_argument("--warmup", type=int, default=2)
    args = ap.parse_args()

    from model.aread import AREAD  # reference code, read-only

    one_hot_dims = np.array([1368287, 7, 25, 40, 11, 150000, 12])
    seq_maxlen, n_seq = 5, 2
    multi_hot_dict = {
        "multi_hot_flag": [False] * len(one_hot_dims) + [True] * (n_seq * seq_maxlen),
        "itemid_idx": 0, "seq_maxlen": seq_maxlen, "method": "mean",
    }
    cfg = types.SimpleNamespace(
        dataset_name="amazon",
        domain_size={"amazon": [1] * 25},
        use_dcn=True, use_atten=False, n_cross_layers=3, mmoe_n_expert=4,
    )
    model = AREAD(one_hot_dims, 32, multi_hot_dict, n_tower=(3, 6, 12),
                  n_domain=25, base_model="mmoe",
                  expert_dims=(256, 128, 64),
                  tower_dims=((64, 32), (32, 16), (16, 8)),
                  domain_idx=2, device=torch.device("cpu"), config=cfg)
    model.train()
    # all-active masks for every domain (same shapes as bench.py)
    full = [torch.ones(1, 3, dtype=torch.bool), torch.ones(3, 6, dtype=torch.bool),
            torch.ones(6, 12, dtype=torch.bool), torch.ones(12, 1, dtype=torch.bool)]
    model.domain_mask = [[m.clone() for m in full] for _ in range(25)]

    rng = np.random.default_rng(0)
    cols = [rng.integers(0, d, size=(args.bs, 1)) for d in one_hot_dims]
    seqs = rng.integers(0, one_hot_dims[0], size=(args.bs, n_seq * seq_maxlen))
    X = torch.tensor(np.concatenate(cols + [seqs], axis=1), dtype=torch.long)
    y = torch.tensor(rng.integers(0, 2, size=args.bs).astype(np.float32))

    optimizer = torch.optim.Adam(model.parameters(), lr=1e-3, betas=(0.9, 0.99),
                                 eps=1e-8, weight_decay=1e-8)
    criterion = torch.nn.BCELoss(reduction="mean")

    def step():
        preds = model(X, mode="domain_mask_bagging", domain_i=0)
        losses = [criterion(pred, y) for pred in preds.unbind(dim=0)]
        loss = sum(losses) / preds.shape[0] + model.get_regularization_loss(
            device=torch.device("cpu"))
        model.zero_grad()
        loss.backward()
        optimizer.step()
        return float(loss)

    for _ in range(args.warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        step()
    dt = time.perf_counter() - t0
    eps = args.bs * args.steps / dt
    print(f"reference AREAD train step: {dt/args.steps*1000:.1f} ms/step, "
          f"{eps:.1f} examples/s (bs={args.bs}, cpu threads="
          f"{torch.get_num_threads()})")


if __name__ == "__main__":
    main()
