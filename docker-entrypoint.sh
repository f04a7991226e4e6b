#!/bin/sh
# Env-var -> CLI-flag shim (mirrors the reference's docker entrypoint):
# every HVD-relevant env var becomes the matching flag so compose files can
# configure the container without a command line.
set -e

ARGS=""
[ -n "$HYDRUS_API_KEY" ] && ARGS="$ARGS --api-key $HYDRUS_API_KEY"
[ -n "$HYDRUS_API_URL" ] && ARGS="$ARGS --api-url $HYDRUS_API_URL"
[ -n "$DEDUP_DATABASE_DIR" ] && ARGS="$ARGS --dedup-database-dir $DEDUP_DATABASE_DIR"
[ -n "$THRESHOLD" ] && ARGS="$ARGS --threshold $THRESHOLD"
[ -n "$JOB_COUNT" ] && ARGS="$ARGS --job-count $JOB_COUNT"
[ -n "$FAILED_PAGE_NAME" ] && ARGS="$ARGS --failed-page-name $FAILED_PAGE_NAME"
[ -n "$SEARCH_BACKEND" ] && ARGS="$ARGS --search-backend $SEARCH_BACKEND"
[ -n "$HASH_BACKEND" ] && ARGS="$ARGS --hash-backend $HASH_BACKEND"
[ "$SKIP_HASHING" = "true" ] && ARGS="$ARGS --skip-hashing"
[ "$CLEAR_SEARCH_TREE" = "true" ] && ARGS="$ARGS --clear-search-tree"
[ "$CLEAR_SEARCH_CACHE" = "true" ] && ARGS="$ARGS --clear-search-cache"
[ "$VERBOSE" = "true" ] && ARGS="$ARGS --verbose"

exec python -m hydrus_video_deduplicator_tpu $ARGS "$@"
