"""Physical plans: medallion layout, bucketing, pipeline orchestration."""
