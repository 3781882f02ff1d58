#!/bin/sh
# Deployment smoke run for the north rule's "runs via spark-submit
# --py-files" clause: stage a tiny fixture corpus, zip the package,
# and spark-submit the FULL checkpoint-resumable pipeline from a
# NEUTRAL working directory (the repo is NOT on sys.path — driver
# imports AND executor-side pandas-UDF unpickling must both resolve
# corhist_spark from the --py-files zip, which is exactly what a real
# multi-executor cluster requires).  Exits non-zero unless the
# submitted app prints its per-table row counts.
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="$(mktemp -d /tmp/submit_smoke_XXXX)"
trap 'rm -rf "$WORK"' EXIT

# 1. stage fixture inputs (driver-local staging session; the submitted
#    app below runs in its OWN JVM without the repo on its path)
cd "$REPO" && python - "$WORK" <<'PY'
import json, sys
from corhist_spark.fixtures import generate_corpus, to_spark
from corhist_spark.session import get_spark

work = sys.argv[1]
spark = get_spark("submit-smoke-stage", cores=4, shuffle_partitions=4)
corpus = generate_corpus(seed=42, scale=3)
sdf = to_spark(spark, corpus)
for name in ("documents", "edits", "revisions", "sameas_edges"):
    sdf[name].write.mode("overwrite").parquet(f"{work}/{name}")
with open(f"{work}/constraints.jsonl", "w") as f:
    for row in corpus["constraints"].to_dict("records"):
        f.write(json.dumps(row) + "\n")
spark.stop()
PY

# 2. package the library the way a cluster deployment ships it
python -c "import shutil, sys; shutil.make_archive(sys.argv[1] + '/corhist_spark', 'zip', '$REPO', 'corhist_spark')" "$WORK"
cp "$REPO/tools/run_pipeline.py" "$WORK/run_pipeline.py"

# 3. submit from the neutral directory — no repo on sys.path anywhere
cd "$WORK"
unset PYTHONPATH
spark-submit --master "local[${SPARK_GRAFT_SMOKE_CPUS:-8}]" \
  --conf spark.sql.shuffle.partitions=8 \
  --py-files "$WORK/corhist_spark.zip" \
  "$WORK/run_pipeline.py" \
  --warehouse "$WORK/wh" \
  --documents "$WORK/documents" \
  --edits "$WORK/edits" \
  --revisions "$WORK/revisions" \
  --sameas "$WORK/sameas_edges" \
  --constraints "$WORK/constraints.jsonl" \
  --run-id smoke >"$WORK/stdout.log" 2>"$WORK/stderr.log" || {
  echo "FAIL: spark-submit exited non-zero"; tail -40 "$WORK/stderr.log"; exit 1; }
cat "$WORK/stdout.log"

# the final count loop prints all seven stages; require the LAST one
# so a mid-loop failure cannot sneak past (plain sh has no pipefail —
# spark-submit's own status is checked above, unpiped)
grep -q "canonical_triples: " "$WORK/stdout.log" || {
  echo "FAIL: pipeline output missing"; tail -40 "$WORK/stderr.log"; exit 1; }
echo "submit smoke OK"
