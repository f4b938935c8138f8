"""Per-family workload entry modules; see ``workload.build_workload``."""
