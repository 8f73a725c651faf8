#!/bin/bash
# Reference-side gradient-analysis probe (VERDICT r4 Next #4): per-loss
# gradient balance of the torch reference's phase-2 (global) training at
# the h2h budget, at two matched states:
#   A. phase-2 START (fresh global nets, GA for ~15 iters)
#   B. phase-2 END   (continue from the iter-600 checkpoint, +15 iters)
# Requires a COMPLETED ref h2h workdir (default /root/hth/ref_s2).
# Each leg ~10 min on one CPU core (GA backwards 6 losses/iter).
set -eu
SRC=${1:-/root/hth/ref_s2}
WORK=$(dirname "$SRC")
BASE=$(basename "$SRC")
REPO=/root/repo

clone() {  # clone <dst> ; copies confs + exp, symlinks the rest
  local dst=$1
  rm -rf "$dst"; mkdir -p "$dst/confs"
  cp "$SRC"/confs/*.conf "$dst/confs/"
  cp -r "$SRC/exp" "$dst/exp"
  for l in data models utils; do
    [ -e "$SRC/$l" ] && ln -sfn "$(readlink -f "$SRC/$l")" "$dst/$l"
  done
}

patch_end_iter() {  # patch_end_iter <conf> <value>
  python3 - "$1" "$2" <<'EOF'
import re, sys
p, v = sys.argv[1], sys.argv[2]
t = open(p).read()
t, n = re.subn(r"(?m)^(\s*end_iter\s*=\s*).*$", rf"\g<1>{v}", t)
assert n == 1, (p, n)
open(p, "w").write(t)
EOF
}

run_ga() {  # run_ga <wd> <log>
  (cd "$1" && exec python "$REPO/scripts/run_reference.py" \
      --conf ./confs/ho3d_virtual.conf --case SYN_ori \
      --global_conf ./confs/ho3d_global_womask.conf \
      --final_mesh_resolution 64 --seed 2 --gradient_analysis \
      --skip_render_poses) > "$2" 2>&1
}

# Leg A: fresh global phase with GA (delete global ckpts so the global
# runner starts from scratch on the already-aligned phase-1 output).
A="$WORK/${BASE}_ga0"
clone "$A"
rm -rf "$A/exp/SYN_ori/ours/ho3d_global_womask/checkpoints"
patch_end_iter "$A/confs/ho3d_global_womask.conf" 15
echo "leg A (phase-2 start) -> $WORK/${BASE}_ga0.log"
run_ga "$A" "$WORK/${BASE}_ga0.log" || echo "leg A rc=$?"

# Leg B: continue from the completed iter-600 checkpoint, +15 GA iters.
B="$WORK/${BASE}_ga600"
clone "$B"
patch_end_iter "$B/confs/ho3d_global_womask.conf" 615
echo "leg B (phase-2 end) -> $WORK/${BASE}_ga600.log"
run_ga "$B" "$WORK/${BASE}_ga600.log" || echo "leg B rc=$?"
echo DONE
