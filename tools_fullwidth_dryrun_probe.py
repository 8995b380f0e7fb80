"""Run the FULL-WIDTH (0.5B/SO400M) video-pipeline execution on the
virtual 8-device CPU mesh (VERDICT round-4 item 6a) — the canonical entry
is __graft_entry__.dryrun_video_pipeline_fullwidth; this wrapper exists so
the run has a stable tool name. One execution costs ~10-25 min of XLA:CPU
compute on a 1-core host (measured 1381.6 s under contention, round 5),
which is why it is NOT part of dryrun_multichip's subprocess budget.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python tools_fullwidth_dryrun_probe.py
"""
import time

import jax

jax.config.update("jax_platforms", "cpu")

import __graft_entry__  # noqa: E402

t0 = time.time()
__graft_entry__.dryrun_video_pipeline_fullwidth(len(jax.devices()))
print(f"wall {time.time()-t0:.1f}s", flush=True)
