"""Global debug flag singleton (reference kin_poly/utils/flags.py:8)."""


class Flags:
    def __init__(self, items):
        for k, v in items.items():
            setattr(self, k, v)


flags = Flags({"debug": False})
