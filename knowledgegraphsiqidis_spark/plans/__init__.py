"""Job plans: the extract→resolve→build pipeline DAG with checkpointed stages."""
