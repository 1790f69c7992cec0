#!/bin/bash
# Wait for the TPU relay (port 8083) to come back, then relaunch the queue.
while true; do
  if (exec 3<>/dev/tcp/127.0.0.1/8083) 2>/dev/null; then
    exec 3>&- 3<&-
    sleep 30
    if (exec 3<>/dev/tcp/127.0.0.1/8083) 2>/dev/null; then
      exec 3>&- 3<&-
      echo "$(date) tunnel back; launching queue"
      bash /root/repo/scripts/resume_r2ef2.sh
      exit 0
    fi
  fi
  sleep 60
done
