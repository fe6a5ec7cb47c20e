"""Statistics meters (mirrors reference tools.py:284-320)."""


class MovingAverage:
    """Running (weighted) mean."""

    def __init__(self):
        self._sum = 0.0
        self._count = 0

    def add_value(self, sigma, addcount=1):
        self._sum += float(sigma)
        self._count += addcount

    def add_average(self, avg, addcount=1):
        self._sum += float(avg) * addcount
        self._count += addcount

    def mean(self):
        if self._count == 0:
            return 0.0
        return self._sum / self._count


class ExponentialMovingAverage:
    """EMA with bias-corrected warmup (tools.py:303-320)."""

    def __init__(self, alpha=0.7):
        self._weight = 0.0
        self._numerator = 0.0
        self._alpha = alpha

    def add_value(self, sigma):
        self._numerator = self._alpha * self._numerator + (1 - self._alpha) * float(sigma)
        self._weight = self._alpha * self._weight + (1 - self._alpha)

    def add_average(self, avg, addcount=1):
        for _ in range(addcount):
            self.add_value(avg)

    def mean(self):
        if self._weight == 0.0:
            return 0.0
        return self._numerator / self._weight
