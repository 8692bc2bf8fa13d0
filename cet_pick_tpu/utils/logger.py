"""Experiment logging: opt dump, timestamped text log, tensorboard scalars.

Rebuild of reference cet_pick/logger.py:18-72: writes the full config to
``opt.txt``/``opt.json`` (:27-38), appends per-epoch metric lines to
``logs_<timestamp>/log.txt`` (:40-64), and mirrors scalars to tensorboardX
when available (:69-72). Model selection stays "pick lowest loss in log.txt"
(docs/explore.md:107-108).
"""

from __future__ import annotations

import os
import sys
import time


class Logger:
    def __init__(self, config, use_tensorboard=True):
        self.config = config
        os.makedirs(config.save_dir, exist_ok=True)
        time_str = time.strftime("%Y-%m-%d-%H-%M")

        # full config dump (logger.py:27-38)
        with open(os.path.join(config.save_dir, "opt.txt"), "w") as f:
            f.write(f"==> commandline: {' '.join(sys.argv)}\n")
            f.write(f"==> created: {time_str}\n")
            f.write(config.to_json() + "\n")
        config.save(os.path.join(config.save_dir, "opt.json"))

        log_dir = os.path.join(config.save_dir, f"logs_{time_str}")
        os.makedirs(log_dir, exist_ok=True)
        self.log_path = os.path.join(log_dir, "log.txt")
        self._log = open(self.log_path, "a")
        self._start_line = True

        self.writer = None
        if use_tensorboard:
            try:
                import tensorboardX

                self.writer = tensorboardX.SummaryWriter(log_dir=log_dir)
            except Exception:
                self.writer = None

    def write(self, txt):
        """Append to log.txt, prefixing wall-time at line starts (logger.py:55-64)."""
        if self._start_line:
            self._log.write(f"{time.strftime('%Y-%m-%d-%H-%M')}: ")
        self._log.write(txt)
        self._start_line = txt.endswith("\n")
        self._log.flush()

    def log(self, msg):
        """Print + append to log.txt — the train commands' log_fn."""
        print(msg)
        self.write(str(msg) + "\n")

    def scalar_summary(self, tag, value, step):
        if self.writer is not None:
            self.writer.add_scalar(tag, value, step)

    def log_epoch(self, epoch, metrics, prefix="train"):
        self.write(f"epoch: {epoch} |")
        for k, v in metrics.items():
            self.scalar_summary(f"{prefix}_{k}", v, epoch)
            self.write(f"{k} {v:8f} | ")
        self.write("\n")

    def close(self):
        self._log.close()
        if self.writer is not None:
            self.writer.close()
