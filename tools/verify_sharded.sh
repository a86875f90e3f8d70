#!/bin/bash
# Sweep the full oracle registry in N parallel shards (default 4).
# Usage: tools/verify_sharded.sh [sf_dir] [N]
set -u
SF="${1:-/root/testdata/sf0.01}"
N="${2:-4}"
DIR="$(mktemp -d)"
for i in $(seq 0 $((N-1))); do
  python "$(dirname "$0")/verify_local.py" "$SF" --shard "$i/$N" \
    > "$DIR/shard_$i.log" 2>&1 &
done
wait
FAIL=0
for i in $(seq 0 $((N-1))); do
  tail -1 "$DIR/shard_$i.log"
  grep -q "^FAIL" "$DIR/shard_$i.log" && { FAIL=1; grep "^FAIL" "$DIR/shard_$i.log"; }
done
echo "logs: $DIR"
exit $FAIL
