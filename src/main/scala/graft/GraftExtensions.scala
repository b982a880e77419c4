package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session extension installing graft's native Catalyst functions
  * (currently [[graft.functions.ScaledDot]] as `scaled_dot`).
  *
  * Wired through the standard static conf — `Tables.requiredConfs` carries
  * `spark.sql.extensions = graft.GraftExtensions`, so every entry point
  * (Smoke/Verify/Bench/tests) and any user session built with those confs
  * gets the functions without calling registration code. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction(graft.functions.ScaledDot.descriptor)
    extensions.injectFunction(graft.functions.IntDot.descriptor)
    extensions.injectFunction(graft.functions.TermProfile.descriptor)
    extensions.injectFunction(graft.functions.MinhashSig.descriptor)
    extensions.injectFunction(graft.functions.MinhashSig.descriptorXx)
    extensions.injectFunction(graft.functions.GramSet.descriptor)
    extensions.injectFunction(graft.functions.GramSet.descriptorXx)
    extensions.injectFunction(graft.functions.RpLshKeys.descriptor)
    extensions.injectFunction(graft.functions.SimhashSig.descriptor)
    extensions.injectFunction(graft.functions.SimhashSig.descriptorXx)
    extensions.injectFunction(graft.functions.RollingFp.descriptor)
    extensions.injectFunction(graft.functions.VerifiedBucketPairs.descriptor)
    extensions.injectFunction(graft.functions.BucketIdPairs.descriptor)
    extensions.injectFunction(graft.functions.HammingBucketPairs.descriptor)
    extensions.injectFunction(graft.functions.ImageHeaderMeta.descriptor)
    extensions.injectFunction(graft.functions.ArgMaxBy.descriptor)
    extensions.injectFunction(graft.functions.TopKBy.descriptor)
    // rewrite handwritten HOF scaled-dot chains to the native kernel
    extensions.injectOptimizerRule(_ => graft.plans.HofScaledDotRewrite)
  }
}
