"""spark-submit entrypoint for cluster runs (the north rule's deployment shape).

Usage on a cluster (any CLI subcommand works — test, snapshot, lint, ...):

    cd /root/repo && zip -qr /tmp/dcspark.zip dcspark
    spark-submit --py-files /tmp/dcspark.zip \
        scripts/spark_submit_entry.py test contracts/audio_clips.yaml \
        --path /data --ref-stats snapshots/

Inside spark-submit the session already exists, so pass no --master: the CLI's
builder picks up the submitted context via getOrCreate(). Local smoke:

    spark-submit scripts/spark_submit_entry.py lint contracts/audio_clips.yaml
"""

import sys

from dcspark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
