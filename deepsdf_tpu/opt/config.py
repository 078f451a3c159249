"""Dot-access config loading (ref: optimization/config.py:3-35)."""

from __future__ import annotations

import json


class Dict(dict):
    """dot.notation access to dictionary attributes."""

    __getattr__ = dict.__getitem__
    __setattr__ = dict.__setitem__
    __delattr__ = dict.__delitem__


class Config:
    @staticmethod
    def __load__(data):
        if isinstance(data, dict):
            return Config.load_dict(data)
        if isinstance(data, list):
            return Config.load_list(data)
        return data

    @staticmethod
    def load_dict(data: dict):
        result = Dict()
        for key, value in data.items():
            result[key] = Config.__load__(value)
        return result

    @staticmethod
    def load_list(data: list):
        return [Config.__load__(item) for item in data]

    @staticmethod
    def load_json(path):
        with open(path) as f:
            return Config.__load__(json.loads(f.read()))
