#!/usr/bin/env bash
# Preflight gate: run between the LAST code edit of a round and the final
# commit.  Two end-of-round snapshots in a row (78e150d, dd79136) shipped
# corpus regressions because the final edit landed untested; this script
# is the rule that prevents a third.
#
# Usage:  tools/preflight.sh [--fast]
#   default: full pytest suite (the round's hard gate)
#   --fast:  corpus suite + dialect/script units only (~1 min), for
#            intermediate checkpoints; the FINAL commit needs the default.
#
# On success writes tools/preflight.ok with the HEAD+dirty-tree hash it
# verified, so the green run is recorded alongside the commit.
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-}" == "--fast" ]]; then
    TARGETS=(tests/test_reference_corpus.py tests/test_dialect.py tests/test_script.py)
else
    TARGETS=(tests/)
fi

echo "preflight: pytest ${TARGETS[*]}"
python -m pytest "${TARGETS[@]}" -q

TREE_HASH=$( (git rev-parse HEAD; git diff; git diff --cached) | sha256sum | cut -d' ' -f1)
{
    echo "verified_tree=${TREE_HASH}"
    echo "mode=${1:-full}"
    echo "date=$(date -u +%Y-%m-%dT%H:%M:%SZ)"
} > tools/preflight.ok
echo "preflight: GREEN (tools/preflight.ok written)"
