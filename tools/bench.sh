#!/usr/bin/env bash
# Driver-facing bench wrapper.
#
# Problem this solves: `sbt "runMain graft.Bench"` prints the metric
# JSON line, but sbt then appends its own "[success] Total time: …"
# trailer, so a parser that reads the LAST stdout line gets sbt noise
# instead of the metric (BENCH_r01..r04 all show "parsed": null).
#
# Contract:
#   - stdout: exactly one line — the metric JSON
#     {"metric":"total","value":…,"unit":"sec","queries":{…},…}
#   - stderr: all sbt/Spark logging
#   - exit code: non-zero if the bench failed or produced no metric
#
# The same JSON is also durably written to $SPARK_GRAFT_BENCH_OUT
# (default: BENCH_METRIC.json in the repo root) by graft.Bench itself,
# so a file-reading driver and a stdout-reading driver both work.
#
# Env (all optional):
#   SPARK_GRAFT_SF_DIR     testdata dir   (default /root/testdata/sf0.1)
#   SPARK_GRAFT_CPUS       local[N]       (default 32)
#   SPARK_GRAFT_BENCH_RUNS timed passes   (default 3; median reported)
#   SPARK_GRAFT_BENCH_OUT  metric file    (default BENCH_METRIC.json)
set -u
cd "$(dirname "$0")/.."

export SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
export SPARK_GRAFT_BENCH_OUT="${SPARK_GRAFT_BENCH_OUT:-BENCH_METRIC.json}"

# Stale metric from a previous run must not be mistaken for this run's.
rm -f "$SPARK_GRAFT_BENCH_OUT" "$SPARK_GRAFT_BENCH_OUT.compact"

# Everything sbt prints — including the bench's own stdout copy of the
# JSON and sbt's [success]/[error] trailer — goes to stderr.
sbt "runMain graft.Bench" 1>&2
rc=$?

if [ -f "$SPARK_GRAFT_BENCH_OUT" ]; then
  # Line 1: the full metric JSON (per-query medians + stats).
  # Line 2 (final): the compact totals-only variant — ~300 bytes, so a
  # parser that keeps only a byte-bounded TAIL of stdout still gets a
  # complete {"metric":"total",…} object even when the full line would
  # be beheaded mid-way (the BENCH_r05 failure mode).
  cat "$SPARK_GRAFT_BENCH_OUT"
  [ -f "$SPARK_GRAFT_BENCH_OUT.compact" ] && cat "$SPARK_GRAFT_BENCH_OUT.compact"
else
  echo "bench.sh: no metric file at $SPARK_GRAFT_BENCH_OUT (sbt rc=$rc)" 1>&2
  exit 1
fi
exit $rc
