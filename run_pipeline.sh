#!/bin/bash

# Multi-Modal VAE Pipeline Runner (TPU-native)
# Mirrors the reference's run_pipeline.sh — with the difference that
# train.py and evaluate.py actually exist here (the reference references
# but never shipped them; see SURVEY.md integrity notes).

set -e  # Exit on error

echo "========================================"
echo "Multi-Modal VAE Training Pipeline (TPU)"
echo "========================================"

PREP_ARGS="${PREP_ARGS:-}"

echo ""
echo "Step 1/3: Preparing data..."
python scripts/prepare_data.py $PREP_ARGS

echo ""
echo "Step 2/3: Training model..."
python train.py

echo ""
echo "Step 3/3: Evaluating model..."
python evaluate.py

echo ""
echo "========================================"
echo "Pipeline completed successfully!"
echo "========================================"
echo ""
echo "Results:"
echo "  - Model checkpoint: checkpoints/best_multivae_<run_id>.npz"
echo "  - Training plots: plots/training_losses_multivae_<run_id>.png"
echo "  - Evaluation results: plots/evaluation_results.json"
echo ""
