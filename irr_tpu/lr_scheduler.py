"""LR schedulers with torch.optim.lr_scheduler-compatible names/signatures.

Semantics mirror torch exactly as the reference uses them
(configuration.py:579-608, runtime.py:569-570): the scheduler counts its own
`.step()` calls from 0 (a resumed stage restarts the count — reference
quirk preserved); `lr(base_lr, n_steps)` returns the lr after n steps.
`ReduceLROnPlateau` is stateful and stepped with the validation loss.
"""

import math


class MultiStepLR:
    def __init__(self, milestones, gamma=0.1, last_epoch=-1):
        self.milestones = sorted(int(m) for m in milestones)
        self.gamma = float(gamma)
        self.offset = int(last_epoch) + 1

    def lr(self, base_lr, n_steps):
        n = n_steps + self.offset
        k = sum(1 for m in self.milestones if m <= n)
        return base_lr * (self.gamma ** k)


class StepLR:
    def __init__(self, step_size, gamma=0.1, last_epoch=-1):
        self.step_size = int(step_size)
        self.gamma = float(gamma)
        self.offset = int(last_epoch) + 1

    def lr(self, base_lr, n_steps):
        n = n_steps + self.offset
        return base_lr * (self.gamma ** (n // self.step_size))


class ExponentialLR:
    def __init__(self, gamma, last_epoch=-1):
        self.gamma = float(gamma)
        self.offset = int(last_epoch) + 1

    def lr(self, base_lr, n_steps):
        return base_lr * (self.gamma ** (n_steps + self.offset))


class CosineAnnealingLR:
    def __init__(self, T_max, eta_min=0.0, last_epoch=-1):
        self.T_max = int(T_max)
        self.eta_min = float(eta_min)
        self.offset = int(last_epoch) + 1

    def lr(self, base_lr, n_steps):
        n = n_steps + self.offset
        return (self.eta_min + (base_lr - self.eta_min)
                * (1 + math.cos(math.pi * n / self.T_max)) / 2)


class LambdaLR:
    """torch.optim.lr_scheduler.LambdaLR (typed in the reference CLI,
    commandline.py:311; no script uses it). lr_lambda maps epoch-count ->
    multiplicative factor; accepts a callable or a python expression string
    of `epoch` (the only form expressible through the CLI)."""

    def __init__(self, lr_lambda=None, last_epoch=-1):
        if isinstance(lr_lambda, str):
            expr = lr_lambda
            lr_lambda = lambda epoch: eval(expr, {"__builtins__": {}},
                                           {"epoch": epoch, "math": math})
        self.lr_lambda = lr_lambda if lr_lambda is not None else (lambda e: 1.0)
        self.offset = int(last_epoch) + 1

    def lr(self, base_lr, n_steps):
        return base_lr * float(self.lr_lambda(n_steps + self.offset))


class ReduceLROnPlateau:
    def __init__(self, mode="min", factor=0.1, patience=10, threshold=1e-4,
                 cooldown=0, min_lr=0.0):
        self.mode = mode
        self.factor = float(factor)
        self.patience = int(patience)
        self.threshold = float(threshold)
        self.cooldown = int(cooldown)
        self.min_lr = float(min_lr)
        self._best = None
        self._num_bad = 0
        self._cooldown_left = 0
        self._scale = 1.0

    def _is_better(self, value):
        if self._best is None:
            return True
        if self.mode == "min":
            return value < self._best * (1 - self.threshold)
        return value > self._best * (1 + self.threshold)

    def step(self, value):
        if self._is_better(value):
            self._best = value
            self._num_bad = 0
        elif self._cooldown_left > 0:
            self._cooldown_left -= 1
        else:
            self._num_bad += 1
            if self._num_bad > self.patience:
                self._scale *= self.factor
                self._num_bad = 0
                self._cooldown_left = self.cooldown

    def lr(self, base_lr, n_steps=None):
        return max(base_lr * self._scale, self.min_lr)
