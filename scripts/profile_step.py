"""Capture and summarize a device trace of the train step.

The reference's only instrumentation is wall-clock prints
(`/root/reference/train.py:107-110,141-143,437-438`); this tool captures a
real `jax.profiler` device trace and prints per-op self-time aggregates —
usable on any config without tensorboard.

  python scripts/profile_step.py --width 512 --depth 24 --batch 8
"""

import collections
import glob
import gzip
import json
import sys
import tempfile

import click

sys.path.insert(0, ".")


def summarize_trace(trace_dir: str, steps: int):
    traces = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    if not traces:
        raise SystemExit(
            f"no *.trace.json.gz under {trace_dir} — the profiler produced no "
            "trace on this backend"
        )
    path = traces[-1]
    with gzip.open(path) as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    tids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"]["name"]
    ops = [e for e in events if e.get("ph") == "X"
           and tids.get((e["pid"], e.get("tid"))) == "XLA Ops"]
    ops.sort(key=lambda e: (e["ts"], -e["dur"]))

    # self time = duration minus contained children
    stack, self_time, child_time = [], collections.Counter(), collections.Counter()
    sources = {}
    for e in ops:
        ts, dur, name = e["ts"], e["dur"], e["name"]
        while stack and ts >= stack[-1][0] + stack[-1][1]:
            stack.pop()
        if stack:
            child_time[stack[-1][2]] += dur
        stack.append((ts, dur, name))
        self_time[name] += dur
        src = (e.get("args") or {}).get("source")
        if src:
            sources[name] = src
    for name in list(self_time):
        self_time[name] -= child_time.get(name, 0)

    total = sum(self_time.values())
    print(f"\ntotal device self-time: {total/steps/1e3:.2f} ms/step")
    print("\nby op category:")
    groups = collections.Counter()
    for name, d in self_time.items():
        groups[name.split(".")[0]] += d
    for name, d in groups.most_common(12):
        print(f"  {d/steps/1e3:9.2f} ms/step  {name}")
    print("\nby source line (top 15):")
    by_src = collections.Counter()
    for name, d in self_time.items():
        by_src[sources.get(name, "<unattributed>")] += d
    for src, d in by_src.most_common(15):
        print(f"  {d/steps/1e3:9.2f} ms/step  {src}")


@click.command()
@click.option("--width", type=int, default=512)
@click.option("--depth", type=int, default=24)
@click.option("--batch", type=int, default=8)
@click.option("--latent_t", type=int, default=8)
@click.option("--latent_hw", type=int, default=32)
@click.option("--steps", type=int, default=3)
@click.option("--scan/--no-scan", default=False)
@click.option("--remat/--no-remat", default=False)
@click.option("--trace_dir", type=str, default=None)
def main(width, depth, batch, latent_t, latent_hw, steps, scan, remat,
         trace_dir):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from video_diffusion_speedrun_tpu.core.config import DiTConfig
    from video_diffusion_speedrun_tpu.models.dit import init_dit
    from video_diffusion_speedrun_tpu.train.loss import rectified_flow_loss

    cfg = DiTConfig(
        in_channels=16, hidden_size=width, depth=depth,
        num_heads=max(1, width // 128), cross_attn_input_size=4096,
        residual_v=True, train_bias_and_rms=False,
        scan_blocks=scan, remat=remat,
    )
    params = init_dit(jax.random.PRNGKey(0), cfg, 0.1)
    lat = jax.random.normal(jax.random.PRNGKey(1),
                            (batch, 16, latent_t, latent_hw, latent_hw),
                            jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (batch, 512, 4096),
                            jnp.bfloat16)
    rng = jax.random.PRNGKey(3)

    def loss(p):
        l, _ = rectified_flow_loss(p, cfg, lat, ctx, rng)
        return l

    g = jax.jit(jax.grad(loss))
    o = g(params)
    _ = float(jax.tree.leaves(o)[0].ravel()[0])
    click.echo("warmed; tracing...")

    trace_dir = trace_dir or tempfile.mkdtemp(prefix="vds_trace_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        o = g(params)
    _ = float(jax.tree.leaves(o)[0].ravel()[0])
    jax.profiler.stop_trace()
    click.echo(f"trace written to {trace_dir}")
    summarize_trace(trace_dir, steps)


if __name__ == "__main__":
    main()
