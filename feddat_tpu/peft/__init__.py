from feddat_tpu.peft.partition import (
    ROLE_BACKBONE,
    ROLE_HEAD,
    ROLE_LOCAL,
    ROLE_SHARED,
    ROLE_TEACHER,
    label_params,
    merge,
    split_by_roles,
    teacher_refresh,
    trainable_roles,
    comm_roles,
    personal_roles,
)

__all__ = [
    "ROLE_BACKBONE",
    "ROLE_HEAD",
    "ROLE_LOCAL",
    "ROLE_SHARED",
    "ROLE_TEACHER",
    "label_params",
    "merge",
    "split_by_roles",
    "teacher_refresh",
    "trainable_roles",
    "comm_roles",
    "personal_roles",
]
