#!/bin/bash
# Content hash of everything that can change query behavior OR gate
# behavior: main + test source, the build definition (build.sbt +
# project/), and the sweep's own machinery (run.sh, oracle_check.py,
# sweep.sh itself) — a change to the oracle comparator is as
# behavior-bearing as a change to a query. Working tree, not git state — a
# sweep certifies the code that actually ran, committed or not.
set -euo pipefail
cd "$(dirname "$0")/.."
find src project build.sbt \
    tools/run.sh tools/oracle_check.py tools/sweep.sh -type f \
    \( -name '*.scala' -o -name '*.sbt' -o -name '*.properties' \
       -o -name '*.py' -o -name '*.sh' \) -print0 2>/dev/null |
  grep -zv '/target/' |
  sort -z | xargs -0 sha256sum | sha256sum | cut -d' ' -f1
