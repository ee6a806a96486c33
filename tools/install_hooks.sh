#!/bin/bash
# Installs the repo's guard hooks into .git/hooks (idempotent).
set -euo pipefail
cd "$(dirname "$0")/.."
for h in pre-commit commit-msg; do
  cp "tools/hooks/$h" ".git/hooks/$h"
  chmod +x ".git/hooks/$h"
done
echo "hooks installed: pre-commit commit-msg"
