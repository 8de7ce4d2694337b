"""Benchmark: AREAD (flagship) training throughput on the real chip.

Prints ONE JSON line:
  {"metric": "aread_train_examples_per_sec_per_chip", "value": N,
   "unit": "examples/s", "vs_baseline": R}

Setup mirrors the reference's Amazon configuration (run.py:437-450,
config.py): embed_dim 32, bs 1024, 7 one-hot fields + 2 history-seq fields
(seq_maxlen 5), itemid vocab 1,368,287 (config.py:7), HEI towers (3,6,12),
MMoE base with 4 experts, DCN side network — one domain_mask_bagging
train step (forward + backward + Adam) per measurement, exactly the hot
loop of train_aread (run.py:663-681).

vs_baseline compares against the PyTorch reference's measured examples/s on
this container's CPU (see BASELINE.md; the reference publishes no numbers
and this box has no GPU).

Robustness (round-1 driver run: rc=124 with NO output; round-2: the 480 s
claim self-abort emitted value=0.0 while the chip was still being released
by a killed snapshot process — it gave up a run that would have succeeded):
 - every phase transition and a 15 s heartbeat go to stderr, so an external
   timeout is attributable to a specific phase (TPU claim wait vs compile);
 - the single-tenant tunneled TPU takes MINUTES to release a claim held by
   a process that was KILLED (measured ~4 min after a 256 MB leak, ~6 min
   after ~1 GB; clean exits release instantly). The claim happens lazily at
   the FIRST device execution. There is NO self-abort any more: bench waits
   as long as the driver lets it, printing an escalating warning after
   AREAD_TPU_BENCH_CLAIM_WARN_S (default 480 s). If the driver's outer
   timeout fires, the SIGTERM handler emits the diagnostic JSON line
   (value 0, "error": ...) naming the phase — so the driver always gets a
   parseable record and self-aborting early could only lose;
 - the emitted record also carries roofline context (hbm_bw_util, step_ms,
   sweep_bytes_per_step) so the bandwidth-wall claim in BASELINE.md is
   checkable from the artifact alone.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time
from functools import partial

import numpy as np

# Measured via benchmarks/reference_baseline.py on this container
# (PyTorch 2.13 CPU, 2 threads, bs=1024, identical model/shape config):
# 5038 ms/step = 203.3 examples/s. See BASELINE.md.
BASELINE_EXAMPLES_PER_SEC = 203.3

_T0 = time.perf_counter()
_PHASE = {"name": "startup"}
_DONE = threading.Event()
_EMITTED = threading.Event()


def _elapsed() -> float:
    return time.perf_counter() - _T0


def _phase(name: str) -> None:
    _PHASE["name"] = name
    print(f"[bench {_elapsed():7.1f}s] {name}", file=sys.stderr, flush=True)


def _heartbeat() -> None:
    while not _DONE.wait(15.0):
        print(
            f"[bench {_elapsed():7.1f}s] ... still in phase "
            f"'{_PHASE['name']}' (tunneled TPU claim/remote-compile can take "
            "minutes — see CLAUDE.md)",
            file=sys.stderr, flush=True)


def _metric_name() -> str:
    lazy = bool(int(os.environ.get("AREAD_TPU_BENCH_LAZY", "0")))
    moments = os.environ.get("AREAD_TPU_BENCH_MOMENTS") or None
    return ("aread_train_examples_per_sec_per_chip"
            + ("_lazy" if lazy else "") + ("_bf16m" if moments else ""))


def _emit(value: float, vs, error: str | None = None, **extra) -> None:
    if _EMITTED.is_set():
        return
    _EMITTED.set()
    rec = {"metric": _metric_name(), "value": value, "unit": "examples/s",
           "vs_baseline": vs}
    if error:
        rec["error"] = error
    rec.update(extra)
    print(json.dumps(rec), flush=True)


def _die_with_diagnostic(why: str, code: int) -> None:
    _emit(0.0, 0.0, error=f"{why} during phase '{_PHASE['name']}' at "
          f"{_elapsed():.0f}s — likely the TPU claim wait (a previously "
          "KILLED process's session holds the single-tenant chip for "
          "minutes; 11.9 min measured after a round-boundary SIGKILL) or "
          "a cold terminal-side compile")
    sys.stdout.flush()
    # os._exit skips atexit — free HBM here or the NEXT process's claim
    # blocks for minutes (the very failure this bench keeps diagnosing).
    # If this wedges (a signal can interrupt arbitrary jax code), the
    # killer's SIGKILL follow-up still applies; the JSON is already out.
    try:
        from aread_tpu.utils.device_cleanup import release_device_arrays
        release_device_arrays()
    except Exception:
        pass
    os._exit(code)


def _on_signal(signum, frame):  # noqa: ANN001 - signal handler signature
    _die_with_diagnostic(f"killed by signal {signum}", 124)


def _claim_warn(warn_s: float) -> threading.Timer:
    # round-2 lesson: a self-abort here converted a would-have-succeeded
    # run into a 0.0 record (BENCH_r02.json). The SIGTERM handler already
    # guarantees a parseable diagnostic if the DRIVER's timeout fires, so
    # the only correct inner behavior is to keep waiting and warn loudly.
    def warn():
        print(
            f"[bench {_elapsed():7.1f}s] WARNING: TPU claim still pending "
            f"after {warn_s:.0f}s — a previously KILLED process's HBM is "
            "being reclaimed (~4-6 min measured); continuing to wait, the "
            "driver's outer timeout is the only abort",
            file=sys.stderr, flush=True)
    t = threading.Timer(warn_s, warn)
    t.daemon = True
    t.start()
    return t


def main():
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    threading.Thread(target=_heartbeat, daemon=True).start()

    _phase("import jax + enable persistent compile cache")
    import jax
    # production default (config.prng_impl='rbg'): TPU-native dropout PRNG
    jax.config.update("jax_default_prng_impl", "rbg")
    from aread_tpu.utils.device_cleanup import install as install_device_cleanup
    install_device_cleanup()  # free HBM at exit so the NEXT process's claim
    # is instant (a leaked ~1GB session blocks the chip for ~6 min)
    from aread_tpu.utils.jit_cache import enable as enable_jit_cache
    enable_jit_cache()
    import jax.numpy as jnp

    from aread_tpu.models.aread import AREAD, full_mask
    from aread_tpu.models.base import FeatureSpec, regularization_loss
    from aread_tpu.train.trainer import (batch_fits_kernel, bce_with_logits,
                                         embedding_flat_ids, hybrid_init,
                                         hybrid_update_sparse, make_optimizer,
                                         masked_mean, merge_table,
                                         perturbation_zeros, split_table,
                                         split_variables, strip_table_rule)

    _phase("query devices")
    devs = jax.devices()
    print(f"[bench {_elapsed():7.1f}s] devices: {devs}", file=sys.stderr,
          flush=True)

    bs, embed_dim = 1024, 32
    # Amazon layout (run.py:52-54): itemid, weekday, domain, sales_chart,
    # sales_rank, brand, price + pos/neg 6-month sequences
    spec = FeatureSpec(
        one_hot_dims=(1368287, 7, 25, 40, 11, 150000, 12),
        n_seq_fields=2, itemid_idx=0, domain_idx=2, seq_maxlen=5)
    # lane-packed flat table storage, as build_model configures it for
    # sparse_table_grad (a [N, 32] f32 table is physically lane-padded 4x
    # on TPU, and flat<->packed reshapes are multi-ms relayouts)
    spec = spec.with_flat_table(embed_dim)
    n_domain = 25
    model = AREAD(spec=spec, embed_dim=embed_dim, n_tower=(3, 6, 12),
                  n_domain=n_domain, base_model="mmoe",
                  expert_dims=(256, 128, 64),
                  tower_dims=((64, 32), (32, 16), (16, 8)), mmoe_n_expert=4)

    import jax.tree_util as jtu

    rng = np.random.default_rng(0)
    cols = [rng.integers(0, d, size=(bs, 1)) for d in spec.one_hot_dims]
    seqs = rng.integers(0, spec.one_hot_dims[0], size=(bs, 10))
    x = jnp.asarray(np.concatenate(cols + [seqs], axis=1).astype(np.int32))
    y = jnp.asarray(rng.integers(0, 2, size=bs).astype(np.float32))
    valid = jnp.ones((bs,), jnp.float32)
    dm = tuple(jnp.asarray(m) for m in full_mask(model.n_tower))

    # The lazily-deferred single-tenant TPU claim happens at the FIRST
    # device execution. No self-abort (round-2 lesson): warn after warn_s
    # but wait as long as the driver allows.
    warn_s = float(os.environ.get("AREAD_TPU_BENCH_CLAIM_WARN_S", "480"))
    _phase(f"first device execution (TPU claim; unbounded, warn at "
           f"{warn_s:.0f}s)")
    wd = _claim_warn(warn_s)
    _ = float(y.sum())
    wd.cancel()

    _phase("model.init on device")
    variables = jax.jit(
        lambda r, xx: model.init({"params": r, "dropout": r}, xx, mode="wo_mask")
    )(jax.random.PRNGKey(0), x)
    params0, state0 = split_variables(variables)
    optimizer = make_optimizer(1e-3)
    # table L2 GRADIENT folds into the fused Adam kernel; its VALUE (the
    # reference's printed-loss term, run.py:505) accumulates inside the
    # sparse-Adam kernel sweep for free (want_table_l2 below)
    reg_rules = strip_table_rule(type(model).REG_RULES)
    # host-checked no-cond fast dispatch, exactly as the trainers do it
    fits_exact = batch_fits_kernel(spec, embed_dim, np.asarray(x))
    # 200 steps/dispatch + best-of-2: the measurement includes one tunnel
    # round trip (the loss fetch), and RTT spikes of ~50 ms were observed
    # to inflate a 50-step window by ~1 ms/step; a 4x longer scan plus
    # taking the faster of two timed dispatches bounds that distortion
    n_steps = 200

    def make_one_step(moments_dtype, lazy, compute="float32"):
        from aread_tpu.train.trainer import matmul_precision_ctx
        fits = (not lazy) and fits_exact

        def one_step_body(carry, rng):
            # sparse-table-grad step, exactly what the trainers run
            # (train/trainer.py step_core, train/hemp.py): grads w.r.t.
            # the gathered rows via the perturb tap + 2-phase sparse Adam —
            # the dense [1.52M, 32] table cotangent never exists
            params, state, opt_state = carry
            table, rest = split_table(params)

            def loss_fn(rest_p, pert):
                out, new_state = model.apply(
                    {"params": merge_table(rest_p, table),
                     "perturbations": pert, **state}, x, domain_mask=dm,
                    mode="domain_mask_bagging", train=True, mask=valid,
                    mutable=list(state.keys()), rngs={"dropout": rng})
                per_leaf = jax.vmap(
                    lambda lg: masked_mean(bce_with_logits(lg, y), valid),
                    in_axes=1)(out["leaf_logit"])
                la = out["leaf_active"].astype(per_leaf.dtype)
                bce = jnp.sum(per_leaf * la) / jnp.maximum(la.sum(), 1e-8)
                return (bce + regularization_loss(rest_p, reg_rules),
                        new_state)

            pert0 = perturbation_zeros(spec, x, embed_dim)
            (loss, new_state), (g_rest, g_pert) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(rest, pert0)
            ids = embedding_flat_ids(spec, x)
            # reported loss includes the table L2 value, accumulated for
            # free inside the kernel's table sweep (skipped in lazy mode,
            # whose point is O(batch) traffic — lazy deviates from the
            # reference anyway; users pair it with --loss_report_table_l2 0)
            out = hybrid_update_sparse(
                optimizer, 1e-3, 1e-8, params, g_rest, ids,
                g_pert["embedding"]["rows"], opt_state,
                table_shape=(int(np.sum(spec.one_hot_dims)), embed_dim),
                lazy=lazy, assume_no_overflow=fits, want_table_l2=not lazy)
            if lazy:
                new_params, new_opt_state = out
            else:
                new_params, new_opt_state, l2val = out
                loss = loss + l2val
            return (new_params, dict(new_state), new_opt_state), loss

        def one_step(carry, rng):
            # config.compute_dtype='bfloat16' equivalent: fp32 matmuls
            # traced as single-pass bf16 MXU ops (trainer step_core wraps
            # its body the same way, train/trainer.py)
            with matmul_precision_ctx(compute):
                return one_step_body(carry, rng)

        return one_step

    def measure_variant(tag, moments_dtype, lazy, compute="float32",
                        table_dtype="float32"):
        """Compile + time the n_steps-step scan for one optimizer variant.
        Fresh copies of the pristine params/state each time (the scan
        donates its carry); the model forward is identical across
        variants — only the table-optimizer path differs.
        ``table_dtype='bfloat16'`` stores the table itself bf16 with
        stochastic-rounded Adam writes (config.table_dtype; the forward
        casts gathered rows to f32 — ops/embedding.py)."""
        _phase(f"[{tag}] optimizer init (Adam moments, 1.5M-row table)")
        params = jtu.tree_map(jnp.array, params0)
        if table_dtype == "bfloat16":
            tbl, rest = split_table(params)
            params = merge_table(rest, tbl.astype(jnp.bfloat16))
        state = jtu.tree_map(jnp.array, state0)
        opt_state = hybrid_init(optimizer, params,
                                moments_dtype=moments_dtype)
        one_step = make_one_step(moments_dtype, lazy, compute)

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def run_steps(params, state, opt_state, keys):
            (params, state, opt_state), losses = jax.lax.scan(
                one_step, (params, state, opt_state), keys)
            return params, state, opt_state, losses[-1]

        # warmup / compile. NOTE: a host transfer (float(loss)) is the
        # sync point — on this image's tunneled TPU backend,
        # block_until_ready returns before device execution finishes.
        _phase(f"[{tag}] compile {n_steps}-step scan (remote compile; "
               "cold terminal ~60-120s)")
        keys = jax.random.split(jax.random.PRNGKey(1), n_steps)
        params, state, opt_state, loss = run_steps(params, state,
                                                   opt_state, keys)
        _ = float(loss)
        _phase(f"[{tag}] measure")
        dt = float("inf")
        for rep in (2, 3):
            keys = jax.random.split(jax.random.PRNGKey(rep), n_steps)
            t0 = time.perf_counter()
            params, state, opt_state, loss = run_steps(params, state,
                                                       opt_state, keys)
            _ = float(loss)  # loss depends on the full n_steps chain
            dt = min(dt, time.perf_counter() - t0)
        step_s = dt / n_steps
        rec = {"examples_per_sec": round(bs * n_steps / dt, 1),
               "step_ms": round(step_s * 1e3, 3)}
        if not lazy:
            # Roofline context: the exact-mode step is dominated by the
            # sparse-Adam full table sweep — r+w table (f32 or bf16) and
            # r+w both Adam moments (f32 or bf16). hbm_bw_util = sweep
            # bytes / step time / v5e peak HBM bandwidth (819 GB/s), making
            # BASELINE.md's bandwidth-wall claim checkable from the record.
            elt = int(np.sum(spec.one_hot_dims)) * embed_dim
            mom_bytes = 2 if moments_dtype == "bfloat16" else 4
            tab_bytes = 2 if table_dtype == "bfloat16" else 4
            sweep_bytes = 2 * elt * tab_bytes + 4 * elt * mom_bytes
            rec.update(sweep_bytes_per_step=sweep_bytes,
                       hbm_bw_util=round(sweep_bytes / step_s / 819e9, 3))
        # free this variant's moments before the next variant compiles
        del params, state, opt_state
        return rec

    # Variant selection (VERDICT r3 item 6: driver-capture >=2 optimizer
    # variants per round). Legacy single-variant env toggles still work:
    # AREAD_TPU_BENCH_MOMENTS=bfloat16 / AREAD_TPU_BENCH_LAZY=1 measure
    # only that variant (old behavior); default measures exact AND bf16m;
    # AREAD_TPU_BENCH_ALL=1 adds lazy.
    legacy_lazy = bool(int(os.environ.get("AREAD_TPU_BENCH_LAZY", "0")))
    legacy_moments = os.environ.get("AREAD_TPU_BENCH_MOMENTS") or None
    if legacy_lazy or legacy_moments:
        plan = [("primary", legacy_moments, legacy_lazy, "float32",
                 "float32")]
    else:
        # headline = first entry = the PRODUCTION DEFAULT: bf16 TABLE
        # storage with stochastic-rounded writes on top of bf16 moments
        # (config.table_dtype='bfloat16' since r5 — 482k vs 420k ex/s in
        # the same run with identical 2M-row AUC, BASELINE.md defaults
        # decision); bf16m (the r4 default) and exact f32 moments stay
        # recorded as the fallback and bit-exact-torch-Adam variants
        plan = [("bf16t", "bfloat16", False, "float32", "bfloat16"),
                ("bf16m", "bfloat16", False, "float32", "float32"),
                ("exact", None, False, "float32", "float32")]
        if int(os.environ.get("AREAD_TPU_BENCH_ALL", "0")):
            # bf16cm = bf16 moments + single-pass bf16 MXU matmuls
            # (config.compute_dtype='bfloat16'); lazy = torch SparseAdam
            # semantics (documented slower: XLA scatter)
            plan.append(("bf16cm", "bfloat16", False, "bfloat16",
                         "float32"))
            plan.append(("lazy", None, True, "float32", "float32"))

    variants = {}
    for tag, md, lz, cp, td in plan:
        variants[tag] = measure_variant(tag, md, lz, cp, td)

    _DONE.set()
    headline = os.environ.get("AREAD_TPU_BENCH_HEADLINE", plan[0][0])
    head = variants.get(headline) or variants[plan[0][0]]
    eps = head["examples_per_sec"]
    vs = eps / BASELINE_EXAMPLES_PER_SEC if BASELINE_EXAMPLES_PER_SEC else None
    extra = {k: v for k, v in head.items() if k != "examples_per_sec"}
    if len(variants) > 1:
        extra["variants"] = variants
    _emit(eps, round(vs, 2) if vs else None, **extra)
    _phase("done")


if __name__ == "__main__":
    main()
