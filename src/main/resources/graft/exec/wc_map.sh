#!/bin/bash
# Word-count mapper implementing the public Hadoop-streaming course-skeleton
# contract (reference: tests/testdata/exec/wc_map.sh): split the byte stream
# on '[', ']', space and tab (tr's SET1 brackets are LITERAL characters),
# ASCII-lowercase, and emit "<segment><TAB>1" for every segment, empties
# included. Vendored so the registered mr_wordcount_exec query runs without
# the reference checkout mounted.
set -Eeuo pipefail
tr '[ \t]' '\n' | tr '[:upper:]' '[:lower:]' | awk '{print $1"\t1"}'
