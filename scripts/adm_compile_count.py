"""Count XLA compiles per admission in the progressive loop (CPU).

Builds the long_seq_probe Runner config at tiny res on CPU, stubs the
photo/flow device steps (host bookkeeping + admission path stay REAL,
including seg_initialize / query_pose jits), runs through ~12 admissions
with jax_log_compiles on, and prints compiles-per-admission. A healthy
loop compiles a handful of shapes once; a per-admission recompile would
show as a steady nonzero rate (through the TPU tunnel's remote compiler
each compile costs ~20-30 s).

Measured 2026-08-21 (round 5): **0 compiles and ~1 ms host work per
admission** across 12 admissions — the traced-index seg_initialize fix
(2a1d619) holds, and the 256-frame probe's uniform slowdown is NOT an
admission-path recompile (see LONGSEQ.md round-5 section).
"""
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_log_compiles", True)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import long_seq_probe as lsp
from fmov_pose_tpu.data.synthetic import make_orbit_sequence
from fmov_pose_tpu.train.runner import Runner
import tempfile

compile_count = [0]


class Counter(logging.Handler):
    def emit(self, record):
        msg = record.getMessage()
        if "Compiling" in msg or "compil" in msg.lower():
            compile_count[0] += 1
            if compile_count[0] < 400:
                print(f"COMPILE[{compile_count[0]}] {msg[:140]}", flush=True)


h = Counter()
logging.getLogger("jax").addHandler(h)
logging.getLogger("jax").setLevel(logging.WARNING)
logging.getLogger("jax._src.interpreters.pxla").addHandler(h)
logging.getLogger("jax._src.dispatch").addHandler(h)

n_frames, adm_iters, res = 14, 30, 48
tmp = tempfile.mkdtemp(prefix="admcount_")
data_dir = os.path.join(tmp, "SYN_ori")
make_orbit_sequence(data_dir, n_frames=n_frames, H=res, W=res, span_deg=80)
conf_path = os.path.join(tmp, "probe.conf")
with open(conf_path, "w") as f:
    f.write(lsp.CONF.format(exp_dir=os.path.join(tmp, "exp"),
                            data_dir=data_dir,
                            flow_dir=os.path.join(tmp, "matches"),
                            end_iter=adm_iters * (n_frames + 2),
                            adm_iters=adm_iters,
                            warm_iters=adm_iters // 2,
                            plan_chunk=1))
r = Runner(conf_path, mode="train", case="SYN_ori", has_global_conf=True)

# stub the device training steps: state unchanged, fake metrics
fake_m = {"loss": np.float32(0.1), "psnr": np.float32(20.0),
          "color_loss": np.float32(0.1), "eikonal_loss": np.float32(0.0)}
r.photo_step = lambda state, packed: (state, dict(fake_m))
r.flow_step = lambda state, packed, pix: (state, dict(fake_m))

marks = []
orig_events = r._pro_events

def timed_events():
    c0, t0 = compile_count[0], time.time()
    orig_events()
    marks.append((r.current_image, compile_count[0] - c0,
                  round(time.time() - t0, 3)))

r._pro_events = timed_events
base = compile_count[0]
print(f"=== init compiles: {base} ===", flush=True)
t0 = time.time()
r.train()
print(f"=== train wall {time.time()-t0:.1f}s, total compiles "
      f"{compile_count[0]} (init {base}) ===")
for img, dc, dt in marks:
    print(f"admission -> image {img}: {dc} compiles, {dt}s")
