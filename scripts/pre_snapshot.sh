#!/usr/bin/env bash
# Compile gate for snapshots/commits.
#
# Rounds 6-8 shipped an end-of-round snapshot whose HEAD did not compile,
# which zeroed the correctness and bench gates for three rounds. This script
# is the guard: it refuses to let a snapshot (or any commit, when installed
# as .git/hooks/pre-commit) land unless `sbt -batch compile` is green on the
# working tree.
#
# Usage:
#   scripts/pre_snapshot.sh          # run the gate once
#   scripts/pre_snapshot.sh install  # symlink as .git/hooks/pre-commit
#
# The gate compiles main sources only (not tests) to keep the per-commit cost
# at ~20-30s warm; the full `sbt test` suite remains the per-milestone bar.
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-}" == "install" ]]; then
  ln -sf ../../scripts/pre_snapshot.sh .git/hooks/pre-commit
  echo "installed scripts/pre_snapshot.sh as .git/hooks/pre-commit"
  exit 0
fi

echo "[pre_snapshot] sbt -batch compile ..."
if ! sbt -batch compile > /tmp/pre_snapshot_compile.log 2>&1; then
  echo "[pre_snapshot] COMPILE FAILED — refusing to commit. Tail:"
  tail -30 /tmp/pre_snapshot_compile.log
  exit 1
fi
echo "[pre_snapshot] compile green"
