package graft;

import java.lang.annotation.ElementType;
import java.lang.annotation.Inherited;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;

import org.scalatest.TagAnnotation;

/**
 * Suite-level tag for the slow end-to-end / streaming suites, so the dev
 * inner loop can exclude them:
 *
 *   sbt "testOnly * -- -l graft.SlowTest"     // fast loop (&lt; 5 min)
 *   sbt test                                  // full CI-style run
 */
@TagAnnotation
@Inherited
@Retention(RetentionPolicy.RUNTIME)
@Target({ElementType.METHOD, ElementType.TYPE})
public @interface SlowTest {}
