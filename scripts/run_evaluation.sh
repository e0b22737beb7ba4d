#!/usr/bin/env bash
# CARLA leaderboard evaluation launcher (mirror of the reference's
# leaderboard/scripts/run_evaluation.sh usage, README.md:69-74):
#
#   ROUTES=assets/routes_lav_valid.xml \
#   SCENARIOS=assets/all_towns_traffic_scenarios_public.json \
#   CHECKPOINT_ENDPOINT=results.json \
#   TEAM_CONFIG=config_v2.yaml \
#   ./scripts/run_evaluation.sh
#
# Requires a CARLA 0.9.10.1 server + the leaderboard repo on PYTHONPATH
# (not present in the build image; the agent module degrades gracefully).
set -euo pipefail

export TEAM_AGENT=${TEAM_AGENT:-lav_tpu/agent/carla_adapter.py}
export TEAM_CONFIG=${TEAM_CONFIG:-config_v2.yaml}
export ROUTES=${ROUTES:?set ROUTES to a route xml}
export SCENARIOS=${SCENARIOS:-}
export CHECKPOINT_ENDPOINT=${CHECKPOINT_ENDPOINT:-results.json}
export REPETITIONS=${REPETITIONS:-1}
export DEBUG_CHALLENGE=${DEBUG_CHALLENGE:-0}

python "${LEADERBOARD_ROOT:?set LEADERBOARD_ROOT}"/leaderboard/leaderboard_evaluator.py \
  --routes="${ROUTES}" \
  ${SCENARIOS:+--scenarios="${SCENARIOS}"} \
  --repetitions="${REPETITIONS}" \
  --agent="${TEAM_AGENT}" \
  --agent-config="${TEAM_CONFIG}" \
  --checkpoint="${CHECKPOINT_ENDPOINT}" \
  --debug="${DEBUG_CHALLENGE}"
