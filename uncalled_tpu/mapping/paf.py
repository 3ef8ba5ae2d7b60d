"""PAF output records with UNCALLED's custom tags.

Field semantics and tag set follow the reference Paf
(read_buffer.cpp:34-131): core 12 PAF columns plus typed tags
mt/wt/qt/rt/ch/ej/st/mx/tr/mr/en/kp/dl/sc/ce.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Tag:
    MAP_TIME = "mt"
    WAIT_TIME = "wt"
    QUEUE_TIME = "qt"
    RECEIVE_TIME = "rt"
    CHANNEL = "ch"
    UNBLOCK = "ej"
    READ_START = "st"
    IN_SCAN = "mx"
    TOP_RATIO = "tr"
    MEAN_RATIO = "mr"
    ENDED = "en"
    KEEP = "kp"
    DELAY = "dl"
    SEED_CLUSTER = "sc"
    CONFIDENT_EVENT = "ce"


@dataclass
class Paf:
    rd_name: str = ""
    rd_len: int = 0
    is_mapped: bool = False
    ended: bool = False
    rd_st: int = 0
    rd_en: int = 0
    rf_name: str = ""
    rf_st: int = 0
    rf_en: int = 0
    rf_len: int = 0
    fwd: bool = False
    matches: int = 0
    int_tags: list = field(default_factory=list)
    float_tags: list = field(default_factory=list)
    str_tags: list = field(default_factory=list)

    def set_int(self, tag, v):
        self.int_tags.append((tag, int(v)))

    def set_float(self, tag, v):
        self.float_tags.append((tag, float(v)))

    def set_str(self, tag, v):
        self.str_tags.append((tag, str(v)))

    def set_mapped(self, rd_st, rd_en, rf_name, rf_st, rf_en, rf_len, fwd, matches):
        self.is_mapped = True
        self.rd_st = int(rd_st)
        self.rd_en = int(rd_en)
        self.rf_name = rf_name
        self.rf_st = int(rf_st)
        self.rf_en = int(rf_en)
        self.rf_len = int(rf_len)
        self.fwd = bool(fwd)
        self.matches = int(matches)

    def core_fields(self):
        if self.is_mapped:
            return (
                self.rd_name, self.rd_len, self.rd_st, self.rd_en,
                "+" if self.fwd else "-", self.rf_name, self.rf_len,
                self.rf_st, self.rf_en, self.matches,
                self.rf_en - self.rf_st + 1, 255,
            )
        return (self.rd_name, self.rd_len) + ("*",) * 9 + (255,)

    def to_line(self) -> str:
        parts = [str(x) for x in self.core_fields()]
        for t, v in self.int_tags:
            parts.append(f"{t}:i:{v}")
        for t, v in self.float_tags:
            parts.append(f"{t}:f:{v:f}")
        for t, v in self.str_tags:
            parts.append(f"{t}:Z:{v}")
        return "\t".join(parts)
