"""One end-to-end control sample as a standalone process (forked clean,
no JVM threads): pyarrow read + the identical partition kernel + the
equivalent checksum sink, at a given parallelism. Prints one JSON line.

Usage: python tools/e2e_control_cli.py <corpus_dir> <nproc> <n_docs>
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    corpus, nproc, n_docs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    import bench

    rates = bench.e2e_control((nproc,), corpus, n_docs, trials=1)
    print("E2E_CONTROL " + json.dumps({"docs_per_sec": rates[nproc]}))


if __name__ == "__main__":
    main()
