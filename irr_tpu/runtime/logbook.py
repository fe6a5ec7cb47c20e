"""Logging: colored console + color-stripped file logbook with indented
block scopes (mirrors reference logger.py:64-125 and the LOGBOOK level of
tools.py:37-60).

Contract reproduced: console shows indented colored lines; `logbook.txt`
gets the same lines with ANSI codes stripped and [timestamps]; a custom
LOGBOOK level (1000) reaches only the file (used for progress-bar snapshots)
— the de-facto observability surface of the reference.
"""

import logging
import os
import re
import sys

import colorama

LOGBOOK_LEVEL = 1000
_ANSI_RE = re.compile(r"\033\[[0-9]+m")
_state = {"indent": 0}


def logbook(message, *args):
    """Log only to the file handler (level LOGBOOK)."""
    logging.log(LOGBOOK_LEVEL, message, *args)


class _ConsoleFormatter(logging.Formatter):
    def format(self, record):
        record = logging.makeLogRecord(record.__dict__)
        record.msg = " " * _state["indent"] + str(record.msg)
        return super().format(record)


class _LogbookFormatter(logging.Formatter):
    def format(self, record):
        record = logging.makeLogRecord(record.__dict__)
        record.msg = _ANSI_RE.sub("", " " * _state["indent"] + str(record.msg))
        return super().format(record)


class _SkipLogbookFilter(logging.Filter):
    def filter(self, record):
        return record.levelno != LOGBOOK_LEVEL


def configure_logging(filename=None):
    if not hasattr(logging, "LOGBOOK"):
        logging.addLevelName(LOGBOOK_LEVEL, "LOGBOOK")
        logging.LOGBOOK = LOGBOOK_LEVEL
        logging.logbook = logbook

    root = logging.getLogger("")
    root.setLevel(logging.INFO)
    for h in list(root.handlers):
        root.removeHandler(h)

    dim = colorama.Style.DIM
    reset = colorama.Style.RESET_ALL
    datefmt = "%Y-%m-%d %H:%M:%S"

    console = logging.StreamHandler(sys.stdout)
    console.setLevel(logging.INFO)
    console.setFormatter(_ConsoleFormatter(
        fmt=f"{dim}%(asctime)s{reset} %(message)s", datefmt=datefmt))
    console.addFilter(_SkipLogbookFilter())
    root.addHandler(console)

    if filename is not None:
        d = os.path.dirname(filename)
        if d and not os.path.exists(d):
            os.makedirs(d)
        fileh = logging.FileHandler(filename=filename, mode="a", encoding="utf-8")
        fileh.setLevel(logging.INFO)
        fileh.setFormatter(_LogbookFormatter(
            fmt="[%(asctime)s] %(message)s", datefmt=datefmt))
        root.addHandler(fileh)


class LoggingBlock:
    """`with LoggingBlock("Title", emph=True):` indents enclosed log lines
    by 2 (logger.py:108-125)."""

    def __init__(self, title, emph=False):
        if emph:
            bright = colorama.Style.BRIGHT
            cyan = colorama.Fore.CYAN
            reset = colorama.Style.RESET_ALL
            logging.info("%s==>%s %s%s%s", cyan, reset, bright, title, reset)
        else:
            logging.info(title)

    def __enter__(self):
        _state["indent"] += 2
        return self

    def __exit__(self, exc_type, exc_value, tb):
        _state["indent"] -= 2
