"""Training speed-of-light decomposition (VERDICT r2 #7).

Measures, at the shipped pretrain recipe (a2v-large, batch 8, block-scope
remat, clone_batch 12), the device time of each component of the train
step, plus XLA's own cost_analysis FLOPs/bytes for the full step, and
states the measured throughput as a fraction of the chip floor
(179 TFLOP/s bf16 matmul rate / ~819 GB/s HBM — docs/PERF.md round-3
ceiling study).

Pieces (env PARTS, comma-separated; default all):
  full     — full train step (grad + optimizer + EMA)
  fwd      — pretrain loss forward only
  teacher  — EMA-teacher full-sequence forward (streamed targets)
  student  — frontend + masked-student encode + decoders forward
  frontend — local_features (sinc + conv stack) only
  update   — optimizer apply + EMA update with fixed grads
  cost     — XLA cost_analysis of the full step (no TPU time)
  sweep    — analytic state-sweep bytes (params/EMA/optimizer traffic)

Env:
  CFG=v5e    — use the shipped v5e recipe (a2v_large_pretrain_v5e.yaml,
               remat_scope=attn) instead of the generic 4-GPU-shaped yaml
  REMAT=...  — override remat scope (default: the config's)
  COST=1     — additionally lower+compile each PART's scan program and
               print its per-iteration cost_analysis (FLOP + GB): the
               HBM byte decomposition per subgraph. backward-only bytes
               = full − fwd − update (the grad streams + remat recompute
               traffic XLA adds in the backward).

Scan-chain harness, scalar fetch (remote-relay measurement rule,
docs/PERF.md round-2 findings §4).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(batch):
    from animal2vec_tpu.config import load_config
    from animal2vec_tpu.train.build import init_pretrain

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    yaml = (
        "a2v_large_pretrain_v5e.yaml"
        if os.environ.get("CFG") == "v5e"
        else "a2v_large_pretrain.yaml"
    )
    overrides = [
        "common.compute_dtype=bfloat16",
        "optimization.update_freq=1",
    ]
    default_remat = "" if os.environ.get("CFG") == "v5e" else "block"
    remat = os.environ.get("REMAT", default_remat)
    if remat:
        overrides.append("model.remat_scope=" + remat)
    cfg = load_config(os.path.join(here, "animal2vec_tpu/configs", yaml), overrides=overrides)
    model, state = init_pretrain(
        cfg, jax.random.PRNGKey(0), example_wav_len=80_000, example_batch=1
    )
    rng_np = np.random.default_rng(0)
    src = jnp.asarray(rng_np.normal(size=(batch, 80_000)).astype(np.float32))
    return cfg, model, state, src


def part_cost(name, fn, args):
    """cost_analysis of ONE call of ``fn(*args, 0)`` — the HBM byte
    decomposition per subgraph (COST=1). Deliberately NOT the scanned
    program: XLA's cost analysis does not aggregate a while-loop body,
    so a scanned probe under-reports by ~the loop trip count."""
    import functools

    try:
        g1 = jax.jit(functools.partial(fn, i=jnp.int32(0)))
        ca = g1.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        fl = ca.get("flops", 0.0)
        by = ca.get("bytes accessed", 0.0)
        print(
            f"  cost[{name}]: {fl / 1e12:.2f} TFLOP, {by / 1e9:.1f} GB "
            f"accessed / call (HBM floor {by / 819e9 * 1e3:.0f} ms)",
            flush=True,
        )
        return fl, by
    except Exception as e:
        print(f"  cost[{name}] unavailable: {type(e).__name__}: {e}", flush=True)
        return 0.0, 0.0


def chain(name, fn, *args, iters=6, clips=None):
    """fn(*args, i) -> scalar; scan-chained, timed twice.

    args go through jit as runtime operands — closing over them bakes the
    full param tree into the lowered module as constants (2.5 GB), which
    the remote-compile transport rejects."""

    def g_impl(*a):
        def body(c, i):
            return c + fn(*a, i).astype(jnp.float32), None

        return jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))[0]

    g = jax.jit(g_impl)
    t0 = time.perf_counter()
    v = float(np.asarray(g(*args)))
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    v1 = float(np.asarray(g(*args)))
    v2 = float(np.asarray(g(*args)))
    dt = (time.perf_counter() - t0) / (2 * iters)
    assert np.isfinite(v1) and np.isfinite(v2), (name, v1, v2)
    extra = f"  {clips / dt:7.2f} clips/s" if clips else ""
    print(f"{name:40s} {dt * 1e3:9.2f} ms{extra}  (compile {t_compile:.0f}s)", flush=True)
    if os.environ.get("COST") == "1":
        part_cost(name, fn, args)
    return dt


def main():
    parts = set(
        os.environ.get(
            "PARTS", "cost,full,fwd,teacher,student,frontend,update"
        ).split(",")
    )
    batch = int(os.environ.get("PB", "8"))
    cfg, model, state, src = build(batch)
    from animal2vec_tpu.models.data2vec2 import Data2VecMulti
    from animal2vec_tpu.train.pretrain import (
        make_pretrain_train_step, pretrain_loss, _rngs,
    )
    from animal2vec_tpu.train.state import merge_params

    rng = jax.random.PRNGKey(7)
    mode = "AUDIO"
    acfg = cfg.model.modalities.audio

    if "cost" in parts:
        step = make_pretrain_train_step(model, cfg)
        lowered = jax.jit(step).lower(
            state, {"source": src[None]}, rng
        )
        try:
            ca = lowered.compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
        except Exception as e:  # remote PJRT may not expose cost analysis
            print(f"cost_analysis unavailable: {type(e).__name__}: {e}", flush=True)
            ca = {}
        fl = ca.get("flops", 0.0)
        by = ca.get("bytes accessed", 0.0)
        if fl and by:
            t_mxu = fl / 179e12
            t_hbm = by / 819e9
            print(
                f"cost_analysis: {fl / 1e12:.2f} TFLOP, {by / 1e9:.1f} GB accessed\n"
                f"  MXU floor {t_mxu * 1e3:.0f} ms ({batch / t_mxu:.2f} clips/s)"
                f"  | HBM floor {t_hbm * 1e3:.0f} ms ({batch / t_hbm:.2f} clips/s)",
                flush=True,
            )

    if "sweep" in parts:
        # analytic state-sweep traffic: bytes the optimizer/EMA update
        # must move per step regardless of schedule — the irreducible
        # floor of the "update" part
        def nbytes(tree):
            return sum(
                x.size * x.dtype.itemsize
                for x in jax.tree_util.tree_leaves(tree)
                if hasattr(x, "dtype")
            )

        p = nbytes(state.params)
        ema = nbytes(state.ema_params)
        opt = nbytes(state.opt_state)
        # adam: read+write m, v, master params; read grads; EMA: read
        # student subset + read/write teacher shadow
        traffic = 2 * (opt + p) + p + 2 * ema
        print(
            f"state sweep: params {p / 1e9:.2f} GB, EMA {ema / 1e9:.2f} GB, "
            f"opt {opt / 1e9:.2f} GB -> ~{traffic / 1e9:.1f} GB/step "
            f"({traffic / 819e9 * 1e3:.0f} ms HBM floor)",
            flush=True,
        )

    if "full" in parts:
        # donated host-loop step, exactly like bench.py pretrain mode: a
        # scan-of-steps defeats buffer donation (state copies OOM at b8);
        # the ~26 ms relay RTT is ~2% of a ~1.1 s step — acceptable here
        step_fn = jax.jit(make_pretrain_train_step(model, cfg), donate_argnums=(0,))
        t0 = time.perf_counter()
        state, m = step_fn(state, {"source": src[None]}, jax.random.fold_in(rng, 0))
        float(m["loss"])
        tc = time.perf_counter() - t0
        iters = 5
        t0 = time.perf_counter()
        for i in range(iters):
            state, m = step_fn(
                state, {"source": src[None]}, jax.random.fold_in(rng, i + 1)
            )
            float(m["loss"])
        dt = (time.perf_counter() - t0) / iters
        print(f"{'full step':40s} {dt * 1e3:9.2f} ms  {batch / dt:7.2f} clips/s  (compile {tc:.0f}s)", flush=True)

    if "fwd" in parts:
        def fwd(params, ema, i):
            l, _ = pretrain_loss(
                params, ema, {"source": src}, jax.random.fold_in(rng, i),
                model, cfg, True,
            )
            return l

        chain("loss forward only", fwd, state.params, state.ema_params, clips=batch)

    if "teacher" in parts:
        variables = {"params": state.params}
        local = model.apply(variables, src, mode, True, method=Data2VecMulti.local_features)
        teacher_vars = {"params": merge_params(state.params, state.ema_params)}

        def teach(teacher_vars, local, i):
            _, t_acc, _, _ = model.apply(
                teacher_vars,
                local + 0.0 * i,
                mode, None, False, None, None, True,
                True,  # deterministic
                True,  # reduce_targets
                method=Data2VecMulti.encode,
            )
            return t_acc.astype(jnp.float32).mean()

        chain(
            "teacher forward (streamed targets)", teach, teacher_vars, local,
            clips=batch,
        )

    if "student" in parts or "frontend" in parts:
        from animal2vec_tpu.ops.masking import (
            expected_span_mask_tokens, make_mask_info_static, span_mask,
        )

        variables = {"params": state.params}

        if "frontend" in parts:
            def front(variables, i):
                lf = model.apply(
                    variables, src + 0.0 * i, mode, True,
                    method=Data2VecMulti.local_features,
                )
                return lf.astype(jnp.float32).mean()

            chain("conv frontend (local_features)", front, variables, clips=batch)

        if "student" in parts:
            clone = cfg.model.clone_batch

            def stud(variables, i):
                r = jax.random.fold_in(rng, i)
                r_mask, r_student, r_dec = jax.random.split(r, 3)
                local = model.apply(
                    variables, src, mode, False,
                    method=Data2VecMulti.local_features, rngs=_rngs(r),
                )
                b, t, c = local.shape
                local_c = jnp.repeat(local, clone, axis=0)
                mask = span_mask(
                    r_mask, b * clone, t, acfg.mask_prob, acfg.mask_length,
                    acfg.mask_dropout,
                )
                m_tokens = expected_span_mask_tokens(
                    t, acfg.mask_prob, acfg.mask_length, acfg.mask_dropout
                )
                info = make_mask_info_static(mask, m_tokens, acfg.keep_masked_pct)
                x, taps, _, keeps = model.apply(
                    variables, local_c, mode, info, True, None, None,
                    acfg.encoder_zero_mask, False,
                    method=Data2VecMulti.encode, rngs=_rngs(r_student),
                )
                xs = model.apply(
                    variables, x, mode, info, False,
                    method=Data2VecMulti.decode_d2v, rngs=_rngs(r_dec),
                )
                return sum(v.astype(jnp.float32).mean() for v in jax.tree_util.tree_leaves(xs))

            chain(
                "student fwd (frontend+encode+decode)", stud, variables,
                clips=batch,
            )

    if "update" in parts:
        grads = jax.tree_util.tree_map(
            lambda p: jnp.ones_like(p) * 1e-6, state.params
        )

        def state_probe(s):
            # touch EVERY leaf of the final state: an output that uses only
            # .step lets XLA's while-loop simplifier prune the whole
            # optimizer/EMA math from the loop body (measured: "3.5 ms",
            # cost_analysis 0.0 GB — a counter increment, not an update)
            return sum(
                leaf.astype(jnp.float32).mean()
                for leaf in jax.tree_util.tree_leaves(s)
                if hasattr(leaf, "astype")
            )

        def g_impl(s, grads):
            def body(c, i):
                s2 = c.apply_gradients(
                    jax.tree_util.tree_map(lambda g: g * (1.0 + 0.0 * i), grads),
                    cfg.model,
                )
                return s2, None

            return state_probe(jax.lax.scan(body, s, jnp.arange(iters))[0])

        iters = 8
        g = jax.jit(g_impl)
        t0 = time.perf_counter()
        float(np.asarray(g(state, grads)))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(g(state, grads)))
        float(np.asarray(g(state, grads)))
        dt = (time.perf_counter() - t0) / (2 * iters)
        print(f"{'optimizer + EMA update only':40s} {dt * 1e3:9.2f} ms  (compile {tc:.0f}s)", flush=True)
        if os.environ.get("COST") == "1":
            def upd_once(s, grads, i):
                return state_probe(s.apply_gradients(grads, cfg.model))

            part_cost("update", upd_once, (state, grads))


if __name__ == "__main__":
    main()
