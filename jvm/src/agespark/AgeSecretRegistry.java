package agespark;

/**
 * Driver-side staging area for named age secrets on the JVM path.
 *
 * <p>Secret NAMES must never appear resolved in plan text (explain, UI SQL
 * tab, event logs) — VERDICT r10 item 3.  The mechanism that keeps them out:
 * duckdb_age_spark.jvm.register_jvm_crypto pushes the Python SecretManager
 * snapshot into this static registry over py4j, then registers the UDF
 * classes.  {@code registerJavaFunction} constructs each UDF instance
 * DRIVER-SIDE via its no-arg constructor — the constructors here snapshot
 * this registry into a plain serializable instance field — and Spark ships
 * that instance to executors inside the serialized task closure.  So the
 * name→key map travels in the binary closure payload, the same channel the
 * Python path's UDF closures use (register.py docstring), and the SQL plan
 * only ever contains the secret NAME literal.
 *
 * <p>Mutation protocol mirrors register.py: any change to the manager
 * re-pushes the snapshot and RE-REGISTERS the three UDFs, because an
 * already-registered UDF instance holds an immutable snapshot.  That makes
 * the statics here pure staging — executors never read them (their copy is
 * the instance field), so this class being per-JVM is correct on a real
 * multi-JVM cluster, not just on local[*].
 */
public final class AgeSecretRegistry {
    private AgeSecretRegistry() {}

    private static final java.util.concurrent.ConcurrentHashMap<String, String> RECIPIENTS =
            new java.util.concurrent.ConcurrentHashMap<>();
    private static final java.util.concurrent.ConcurrentHashMap<String, String> IDENTITIES =
            new java.util.concurrent.ConcurrentHashMap<>();

    /** Replace-all staging: called over py4j before (re-)registration. */
    public static void clear() {
        RECIPIENTS.clear();
        IDENTITIES.clear();
    }

    /** Stage one secret; either key half may be null (half-defined secrets
     *  are legal in the reference's CREATE SECRET surface). */
    public static void put(String name, String recipient, String identity) {
        if (recipient != null) {
            RECIPIENTS.put(name, recipient);
        } else {
            RECIPIENTS.remove(name);
        }
        if (identity != null) {
            IDENTITIES.put(name, identity);
        } else {
            IDENTITIES.remove(name);
        }
    }

    static java.util.HashMap<String, String> recipientsSnapshot() {
        return new java.util.HashMap<>(RECIPIENTS);
    }

    static java.util.HashMap<String, String> identitiesSnapshot() {
        return new java.util.HashMap<>(IDENTITIES);
    }
}
