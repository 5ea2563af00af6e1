#!/usr/bin/env bash
# Binary-gated Tesseract integration run (round-3 verdict item 7).
#
# Executes TesseractCliOcr end-to-end (page raster -> per-pass preprocessing
# -> tesseract subprocess -> recognized text) via TesseractIntegrationSpec.
# On a host WITHOUT the binary the spec self-cancels (skipped, not green) --
# this script makes that explicit and exits non-zero so CI for the prod
# image can require a real pass.
set -euo pipefail
cd "$(dirname "$0")/.."

if ! command -v tesseract >/dev/null 2>&1; then
  echo "SKIP: tesseract binary not on PATH."
  echo "      Install tesseract-ocr (the reference's Dockerfile installs"
  echo "      tesseract-ocr + language packs) and re-run."
  exit 2
fi

echo "tesseract found: $(command -v tesseract) ($(tesseract --version 2>&1 | head -1))"
exec sbt -batch "testOnly graft.media.TesseractIntegrationSpec"
