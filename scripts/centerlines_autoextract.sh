#!/bin/bash
# Wrapper around the EXTERNAL CNN coronary-centerline tracker (reference
# centerlines_autoextract.sh:1-9 wraps "AllInOne.py" from a separate
# project). Point CENTERLINE_TRACKER_DIR/CENTERLINE_TRACKER_CMD at your
# installation; produces vessel[0-9]*.txt + ostia.xml consumed by
# preprocessing and the marker-recall evaluation.
set -euo pipefail
: "${CENTERLINE_TRACKER_DIR:?set CENTERLINE_TRACKER_DIR to the tracker checkout}"
CMD=${CENTERLINE_TRACKER_CMD:-"python AllInOne.py"}
cd "$CENTERLINE_TRACKER_DIR"
exec $CMD "$1" "$2"
