#!/bin/sh
# sf1 heavy-path bench tier (VERDICT r4 ask 2): generate the 10x sf1
# data (tools/make_sf1.py -> /root/repo/.sf1, gitignored), run the
# heavy-path queries through bench.py, and stamp the result into
# BENCH_SF1.json (committed; embedded into every bench.py output).
set -e
cd "$(dirname "$0")/.."
[ -f .sf1/events.parquet ] || python tools/make_sf1.py
SPARK_GRAFT_SF_DIR="$PWD/.sf1" \
SPARK_GRAFT_BENCH_REPEATS="${SPARK_GRAFT_BENCH_REPEATS:-2}" \
SPARK_GRAFT_BENCH_ONLY="multi_constraint_corrections,single_value_corrections,dedup_survivors,semantic_dedup,knn_ivf_sharded,subclass_closure,minhash_signatures,lsh_candidates,ngram_jaccard,exact_dedup,chunk_dedup" \
python bench.py 2>/dev/null | tail -1 > BENCH_SF1.json.tmp
python - <<'EOF'
import json, subprocess
d = json.load(open("BENCH_SF1.json.tmp"))
d.pop("like_for_like_vs_prev", None)
d.pop("sf1", None)
d["provenance"] = {
    "commit": subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True).stdout.strip(),
    "generator": "tools/make_sf1.py (10 id-shifted worlds of sf0.1)",
}
json.dump(d, open("BENCH_SF1.json", "w"), indent=1)
EOF
rm -f BENCH_SF1.json.tmp
cat BENCH_SF1.json
