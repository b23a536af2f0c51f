#!/usr/bin/env bash
# One-command gate for a fresh clone (mirror of the reference's
# tickbox/precommit scripts, e.g. 40-test-all-features.sh).
#
#   ./precommit.sh          # full: suite + dryrun + bench sanity
#   ./precommit.sh --quick  # suite only
#
# Everything runs on CPU (8 virtual devices) — no TPU required.
set -euo pipefail
cd "$(dirname "$0")"

quick=0
[[ "${1:-}" == "--quick" ]] && quick=1

echo "== native build =="
make -C native >/dev/null

echo "== test suite (CPU, 8 virtual devices) =="
python -m pytest tests/ -q -x

if [[ $quick -eq 0 ]]; then
  echo "== multichip dryrun (8 virtual CPU devices) =="
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

  echo "== graft entry compile check =="
  JAX_PLATFORMS=cpu python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
fn, args = g.entry()
jax.jit(fn).lower(*args).compile()
print("entry() compiles")
EOF

  echo "== bench sanity (CPU path, small) =="
  JAX_PLATFORMS=cpu python bench.py
fi

echo "precommit OK"
