#!/usr/bin/env bash
# Turnkey paper-Table-5 reproduction: all 8 rows (3DmFV ... BGA-PN++) on
# PB_T50_RS main split, reference configs, 12-vote evaluation, markdown
# delta table vs BASELINE.md targets.
#
#   DATA=/path/to/data ./scripts/reproduce_table5.sh          # real h5 tree
#   ./scripts/reproduce_table5.sh --dry_run                   # synthetic check
set -euo pipefail
cd "$(dirname "$0")/.."
if [[ "${1:-}" == "--dry_run" ]]; then
  exec python scripts/reproduce_table5.py --dry_run
fi
exec python scripts/reproduce_table5.py --h5_dir "${DATA:?set DATA to the directory containing h5_files/}" "$@"
