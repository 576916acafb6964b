"""Epoch/iteration bookkeeping with resume (reference util/iter_counter.py).

Persists (epoch, iter) to `{checkpoints_dir}/{name}/iter.txt` so
--continue_train resumes mid-epoch; periodic-trigger predicates fire off
total steps modulo the configured frequencies.
"""

from __future__ import annotations

import os
import time

import numpy as np


class IterationCounter:
    def __init__(self, opt, dataset_size: int):
        self.opt = opt
        self.dataset_size = dataset_size
        self.first_epoch = 1
        self.total_epochs = opt.niter + getattr(opt, "niter_decay", 0)
        self.epoch_iter = 0
        self.iter_record_path = os.path.join(
            opt.checkpoints_dir, opt.name, "iter.txt")
        if getattr(opt, "isTrain", False) and getattr(opt, "continue_train",
                                                      False):
            try:
                self.first_epoch, self.epoch_iter = np.loadtxt(
                    self.iter_record_path, delimiter=",", dtype=int)
                print(f"Resuming from epoch {self.first_epoch} "
                      f"at iteration {self.epoch_iter}")
            except Exception:
                print(f"Could not load iteration record at "
                      f"{self.iter_record_path}. Starting from beginning.")
        self.total_steps_so_far = (
            (self.first_epoch - 1) * dataset_size + self.epoch_iter)

    def training_epochs(self):
        return range(self.first_epoch, self.total_epochs + 1)

    def record_epoch_start(self, epoch):
        self.epoch_start_time = time.time()
        self.last_iter_time = time.time()
        self.current_epoch = epoch

    def record_one_iteration(self):
        current_time = time.time()
        self.time_per_iter = ((current_time - self.last_iter_time)
                              / self.opt.batchSize)
        self.last_iter_time = current_time
        self.total_steps_so_far += self.opt.batchSize
        self.epoch_iter += self.opt.batchSize

    def record_epoch_end(self):
        current_time = time.time()
        self.time_per_epoch = current_time - self.epoch_start_time
        print(f"End of epoch {self.current_epoch} / {self.total_epochs} \t "
              f"Time Taken: {self.time_per_epoch:.0f} sec")
        if self.current_epoch % self.opt.save_epoch_freq == 0:
            np.savetxt(self.iter_record_path,
                       (self.current_epoch + 1, 0), delimiter=",", fmt="%d")
            print(f"Saved current iteration count at "
                  f"{self.iter_record_path}.")
        self.epoch_iter = 0

    def record_current_iter(self):
        np.savetxt(self.iter_record_path,
                   (self.current_epoch, self.epoch_iter),
                   delimiter=",", fmt="%d")
        print(f"Saved current iteration count at {self.iter_record_path}.")

    def needs_saving(self):
        return (self.total_steps_so_far %
                self.opt.save_latest_freq) < self.opt.batchSize

    def needs_printing(self):
        return (self.total_steps_so_far %
                self.opt.print_freq) < self.opt.batchSize

    def needs_displaying(self):
        return (self.total_steps_so_far %
                self.opt.display_freq) < self.opt.batchSize
