from lsfa_tpu.eval.vid_eval import vid_eval, vid_ap  # noqa: F401
