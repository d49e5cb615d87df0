"""Process exit codes — the analog of the reference's ``ReturnCode`` enum
(``/root/reference/inc/enums.h:4-11``: Success / OpenCLDeviceError /
OpenCLProgramError / FileError / OtherError)."""

from __future__ import annotations

import enum


class ReturnCode(enum.IntEnum):
    SUCCESS = 0
    DEVICE_ERROR = 1      # no usable accelerator / runtime failure
    PROGRAM_ERROR = 2     # kernel compilation failure
    FILE_ERROR = 3        # missing or malformed matrix file
    OTHER_ERROR = 4
    VALIDATION_FAILED = 5  # new: kernel output failed the golden check
