from .vote_instances import VoteInstancesParams, to_instance_seg, do_all  # noqa: F401
