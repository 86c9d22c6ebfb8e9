#!/usr/bin/env bash
# Package crawler_spark and run the crawl via spark-submit --py-files
# (north_rule execution mode). Usage:
#   scripts/submit_crawl.sh [master] [extra run_crawl args...]
# e.g. scripts/submit_crawl.sh local[32] --corpus-dir /tmp/corpus \
#          --checkpoint-dir /tmp/ckpt --make-corpus --max-rounds 3
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${1:-local[32]}"
shift || true
ZIP="$(mktemp -d)/crawler_spark.zip"
(cd "$REPO" && python -c "
import zipfile, os
with zipfile.ZipFile('$ZIP', 'w') as z:
    for root, _, files in os.walk('crawler_spark'):
        if '__pycache__' in root: continue
        for f in files:
            if f.endswith('.py'):
                z.write(os.path.join(root, f))
print('packaged', '$ZIP')
")
exec spark-submit --master "$MASTER" \
  --conf spark.sql.shuffle.partitions=32 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.ui.enabled=false \
  --conf spark.ui.showConsoleProgress=false \
  --py-files "$ZIP" \
  "$REPO/crawler_spark/examples/run_crawl.py" "$@"
