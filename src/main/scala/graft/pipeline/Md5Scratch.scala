package graft.pipeline

/** Per-thread reusable MD5 instance for the fused signature expressions
  * ([[MinhashSignatureExpr]], [[SimhashBitsExpr]]): `getInstance("MD5")`
  * allocates a provider lookup + digest object, a measurable per-ROW
  * constant in the hot map phase. Each eval `reset()`s before use, so a
  * thread-local instance is safe to share across rows and expressions on
  * the same task thread. */
private[pipeline] object Md5Scratch {
  private val local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
  def get(): java.security.MessageDigest = { val md = local.get(); md.reset(); md }
}
