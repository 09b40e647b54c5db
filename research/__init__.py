"""Research stack: data, world models, runners, metrics, RL — on the
boxlcd_tpu substrate (reference: /root/reference/research/)."""
