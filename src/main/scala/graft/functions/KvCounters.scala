package graft.functions
object KvCounters { val evals = new java.util.concurrent.atomic.AtomicLong(0) }
