#!/bin/bash
# Wait for the TPU relay (port 8083), then run the prioritized queue.
while true; do
  if (exec 3<>/dev/tcp/127.0.0.1/8083) 2>/dev/null; then
    exec 3>&- 3<&-
    sleep 30
    if (exec 3<>/dev/tcp/127.0.0.1/8083) 2>/dev/null; then
      exec 3>&- 3<&-
      echo "$(date) tunnel back; launching prioritized queue"
      bash /root/repo/scripts/tpu_return_queue.sh
      exit 0
    fi
  fi
  sleep 60
done
