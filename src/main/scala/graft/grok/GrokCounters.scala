package graft.grok
/** Temporary instrumentation for evaluation-count analysis. */
object GrokCounters { val evals = new java.util.concurrent.atomic.AtomicLong(0) }
