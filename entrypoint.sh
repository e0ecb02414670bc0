#!/bin/sh
# Default entrypoint: run the test suite, or exec the given command.
set -e
if [ "$#" -eq 0 ]; then
    exec python -m pytest tests/ -q
fi
exec "$@"
