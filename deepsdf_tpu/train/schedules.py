"""Learning-rate schedules (ref: train_deep_sdf.py:23-93).

Plain host-side objects: the epoch's LRs are computed on host and fed
to the jitted step as traced scalars (no recompilation per epoch).
"""

from __future__ import annotations


class LearningRateSchedule:
    def get_learning_rate(self, epoch: int) -> float:
        raise NotImplementedError


class ConstantLearningRateSchedule(LearningRateSchedule):
    def __init__(self, value):
        self.value = value

    def get_learning_rate(self, epoch):
        return self.value


class StepLearningRateSchedule(LearningRateSchedule):
    def __init__(self, initial, interval, factor):
        self.initial = initial
        self.interval = interval
        self.factor = factor

    def get_learning_rate(self, epoch):
        return self.initial * (self.factor ** (epoch // self.interval))


class WarmupLearningRateSchedule(LearningRateSchedule):
    def __init__(self, initial, warmed_up, length):
        self.initial = initial
        self.warmed_up = warmed_up
        self.length = length

    def get_learning_rate(self, epoch):
        if epoch > self.length:
            return self.warmed_up
        return self.initial + (self.warmed_up - self.initial) * epoch / self.length


def get_learning_rate_schedules(specs: dict) -> list[LearningRateSchedule]:
    """ref: train_deep_sdf.py:59-93 — index 0 = decoder, 1 = latents."""
    schedules = []
    for s in specs["LearningRateSchedule"]:
        if s["Type"] == "Step":
            schedules.append(StepLearningRateSchedule(s["Initial"], s["Interval"], s["Factor"]))
        elif s["Type"] == "Warmup":
            schedules.append(WarmupLearningRateSchedule(s["Initial"], s["Final"], s["Length"]))
        elif s["Type"] == "Constant":
            schedules.append(ConstantLearningRateSchedule(s["Value"]))
        else:
            raise ValueError(f'no known learning rate schedule of type "{s["Type"]}"')
    return schedules
