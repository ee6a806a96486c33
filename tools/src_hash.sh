#!/bin/bash
# Content hash of everything that can change query behavior (main + test
# source and the build definition). Working tree, not git state — a sweep
# certifies the code that actually ran, committed or not.
set -euo pipefail
cd "$(dirname "$0")/.."
find src build.sbt -type f \( -name '*.scala' -o -name '*.sbt' \) -print0 |
  sort -z | xargs -0 sha256sum | sha256sum | cut -d' ' -f1
